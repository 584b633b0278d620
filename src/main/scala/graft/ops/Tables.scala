package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet fixtures (TESTDATA.md).
  *
  * Every operator in the suite takes `(SparkSession, sfDir)` and resolves its
  * inputs here, so the scan is always a plain parquet relation that Catalyst
  * can push filters/projections into (checked via `.explain("formatted")` —
  * `PushedFilters`/`ReadSchema` must reflect the query, see specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, path): repeated spark.read.parquet calls re-list
  // files and re-read footers (~50-100 ms each); the suite reads the same
  // ten tables hundreds of times. DataFrames are immutable plans — reuse is
  // safe.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })

  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Exact table row count from the parquet FOOTERS, read driver-side —
    * the metadata probe a planner uses for path decisions (e.g.
    * pack_sequences' hybrid prefix sum). No Spark job: a `df.count()`
    * schedules a scan stage (~150 ms warm at sf0.1) where the footers
    * already carry the answer; footer reads are planning-sized (one
    * ~KB-range read per file) and memoized per path. */
  def parquetRowCount(spark: SparkSession, dir: String, name: String): Long =
    rowCountCache.computeIfAbsent(s"$dir/$name.parquet", { path =>
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq.filter { f =>
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
        else Seq(fs.getFileStatus(p))
      java.lang.Long.valueOf(files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum)
    })

  /** Spread a scan across the session's parallelism. The fixtures are
    * single-row-group parquet files, so Spark cannot split them — every
    * scan is one partition, and CPU-heavy per-row work (JSON codec,
    * hashing, decode) would run on one core. A real deployment's files
    * split at row-group boundaries; this round-robin repartition stands in
    * for that so the compute after it uses the whole machine. */
  def fan(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.conf.get("spark.sql.shuffle.partitions", "8").toInt)

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read it as long nanos (legacy conf) and truncate to a real
    * microsecond TimestampType column — the same ns→µs truncation DuckDB
    * applies when casting TIMESTAMP_NS to TIMESTAMP, so oracles align.
    *
    * The conf is a SESSION-LEVEL requirement, not a per-read one: Spark's
    * parquet source re-reads `nanosAsLong` from the session's SQLConf at
    * EVERY action's physical planning (the value is copied into the scan's
    * hadoopConf when the reader is built), so a save/restore around this
    * call would make every later execution of the returned frame throw
    * "Illegal Parquet type". Hence: set once, idempotently, and never
    * restored for the life of the session — the same contract a production
    * job would declare in its SparkSession builder.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!s.conf.getOption(key).contains("true")) s.conf.set(key, "true")
    t(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
