package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run the bench suite in sorted order with f1 measured first
  * and last, to isolate cumulative-session slowdowns from per-query cost.
  */
object BenchOrdered {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.create()

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    println(f"FIRST f1: ${time("f1_ndjson_roundtrip")}%.2f")
    var total = 0.0
    for (name <- graft.SparkEntry.queries.keys.toSeq.sorted) {
      val s = time(name)
      total += s
      println(f"RAN $name%-30s $s%6.2f")
    }
    println(f"LAST f1: ${time("f1_ndjson_roundtrip")}%.2f")
    println(f"TOTAL (sorted pass): $total%.2f")
    spark.stop()
  }
}
