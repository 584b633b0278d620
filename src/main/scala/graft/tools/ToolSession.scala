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
    // Opt-in stage profiling: SPARK_GRAFT_EVENTLOG=<dir> writes the
    // standard Spark event log there (tools/stage_profile.py renders the
    // per-stage wall/shuffle/spill table SCALE.md diagnoses read from).
    // System properties because SparkConf loads spark.* props at create.
    sys.env.get("SPARK_GRAFT_EVENTLOG").foreach { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      System.setProperty("spark.eventLog.enabled", "true")
      System.setProperty("spark.eventLog.dir", dir)
      // plain single-file JSON so the parser needs no codec
      System.setProperty("spark.eventLog.compress", "false")
      System.setProperty("spark.eventLog.rolling.enabled", "false")
    }
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first timed query isn't charged for it
    spark.range(1000000).selectExpr("sum(id)").collect(): Unit
    spark
  }
}
