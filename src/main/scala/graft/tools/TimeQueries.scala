package graft.tools

/** Dev tool: time the named contract queries (best of N runs after one
  * warmup) — for targeted perf iteration without the full bench sweep.
  * Usage: runMain graft.tools.TimeQueries [--out isolated.json] q1 q2 ...
  *
  * `--out` writes the per-query map as a JSON sidecar in the same shape
  * as Bench's `bench_sidecar.json` ({"metric":"isolated","queries":{…}})
  * so cross-round suspect triage reads one record per round
  * (`bench_isolated_r{N}.json`) instead of scraping TIMED lines out of
  * commit messages.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (out, names) = args.toSeq match {
      case Seq("--out", f, rest @ _*) => (Some(f), rest)
      case rest                       => (None, rest)
    }
    val spark = ToolSession.create()

    val timed = names.map { name =>
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
      name -> best
    }
    out.foreach { f =>
      val qs = timed.map { case (k, v) => "\"" + k + "\":" + graft.Jfmt.num(v) }
        .mkString("{", ",", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        s"""{"metric":"isolated","unit":"sec","queries":$qs,"sf":"$sfDir"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
