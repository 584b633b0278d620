package graft.tools

import org.apache.spark.sql.SparkSession

/** The one bench-equivalent SparkSession for dev tools. Every timing tool
  * must measure under the config Bench uses (nanos-as-long, UTC, AQE, 32
  * shuffle partitions) — a tool with a drifted config produces numbers
  * that silently don't compare to the bench it iterates against. */
object ToolSession {
  def create(): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first timed query isn't charged for it
    spark.range(1000000).selectExpr("sum(id)").collect(): Unit
    spark
  }
}
