package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time the named contract queries (best of N runs after one
  * warmup) — for targeted perf iteration without the full bench sweep.
  * Usage: runMain graft.tools.TimeQueries q1 q2 ... */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    args.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val best = (1 to 2).map(_ => once()).min
      println(f"TIMED $name%-28s $best%6.2f s")
    }
    spark.stop()
  }
}
