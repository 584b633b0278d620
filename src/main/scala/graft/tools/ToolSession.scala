package graft.tools

import org.apache.spark.sql.SparkSession

/** The bench-equivalent SparkSession for dev timing tools — it IS Bench's
  * bootstrap: same GraftSession.local builder, same SPARK_GRAFT_CPUS
  * default, same warmup. A tool session with drifted config produces
  * numbers that silently don't compare to the bench it iterates against.
  */
object ToolSession {
  def create(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first timed query isn't charged for it
    spark.range(1000000).selectExpr("sum(id)").collect(): Unit
    spark
  }
}
