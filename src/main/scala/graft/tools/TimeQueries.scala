package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time the named contract queries (best of N runs after one
  * warmup) — for targeted perf iteration without the full bench sweep.
  * Usage: runMain graft.tools.TimeQueries q1 q2 ... */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.create()

    args.foreach { name =>
      // noop sink, not count(): executes the COMPLETE plan including the
      // final orderBy/projection (count() lets Catalyst elide them) —
      // same action BenchMedian times, so numbers compare
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val best = (1 to 2).map(_ => once()).min
      println(f"TIMED $name%-28s $best%6.2f s")
    }
    spark.stop()
  }
}
