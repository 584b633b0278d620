package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession wired the way the engine expects.
  *
  * - `spark.sql.legacy.parquet.nanosAsLong=true` — the events fixtures (and
  *   any TIMESTAMP(NANOS) parquet) read as long nanos; `Tables.events`
  *   converts to µs timestamps.
  * - shuffle partitions default to the core count, not Spark's 200 — on a
  *   real cluster callers should size this to data volume instead
  *   (`targetPartitionMB` of shuffle per partition) or rely on AQE
  *   coalescing, which is enabled.
  * - `GraftExtensions` registered, so simhash64/dot_d/minhash_sig/
  *   minhash_shingled/word_ngrams work from SQL.
  *
  * Builder-style: `GraftSession.local(32)` for a local[n] session,
  * `GraftSession.configure(builder)` to wire an existing builder (e.g. one
  * pointed at a cluster master) without taking over its lifecycle.
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .withExtensions(new graft.functions.GraftExtensions)

  def local(cores: Int, shufflePartitions: Option[Int] = None): SparkSession = {
    val s = configure(SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions",
          shufflePartitions.getOrElse(cores).toString)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
