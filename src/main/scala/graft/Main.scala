package graft

import org.apache.spark.sql.SparkSession

import graft.config.ArchiverConfig

/** CLI entry point (cmd/main.go equivalent): load + validate config, run
  * the archive pipeline against a parquet source/target (the sandbox
  * deployment; a JDBC deployment swaps the TableSource/loader wiring),
  * print reconciliation and wall-clock.
  *
  * Usage: runMain graft.Main <conf.json> <sourceDir> <targetDir>
  *          [--incremental | --incremental-time] [--landing json|csv]
  *
  * `--incremental` / `--incremental-time` run the high-watermark delta
  * sync (key- or time-flavored) instead of the full archive: resume from
  * max(split key) already in the target, load only newer rows, reconcile
  * over the full predicate. The scheduled-delta deployment mode.
  * `--landing json|csv` treats <sourceDir> as a file landing zone
  * (NDJSON/CSV drops) instead of parquet tables; the sink schema comes
  * from the config table's first drop.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val Array(confPath, sourceDir, targetDir) = args.take(3)
    var mode = "full"
    var landing: Option[String] = None
    var rest = args.drop(3).toList
    while (rest.nonEmpty) rest match {
      case "--incremental" :: t      => mode = "incremental"; rest = t
      case "--incremental-time" :: t => mode = "incremental-time"; rest = t
      case "--landing" :: fmt :: t   => landing = Some(fmt); rest = t
      case other :: _ => sys.error(s"unknown flag: $other")
      case Nil        => ()
    }
    val cfg = ArchiverConfig.fromJson(
        java.nio.file.Files.readString(java.nio.file.Paths.get(confPath)))
      .fold(e => sys.error(s"config: $e"), identity)

    val spark = {
      val s = GraftSession.configure(SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
          .appName("graft-archiver")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
          .config("spark.ui.enabled", "false"))
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // SIGTERM/SIGQUIT parity with the reference (cmd/main.go:29-35:
    // signal → context cancel). The JVM runs shutdown hooks on both
    // signals; the hook cancels every running Spark job and sweeps the
    // transient staging root. The staged-load commit protocol makes the
    // interruption safe — the next run's chokepoints replay recovery and
    // the staging dir is rewritten with Overwrite — and the process exits
    // with the kill's own 128+signal code (non-zero), matching the
    // reference's cancelled-context exit.
    val hook = new Thread(() => cancelAndSweep(spark, staging(targetDir)),
      "graft-signal-cancel")
    Runtime.getRuntime.addShutdownHook(hook)
    val correct =
      try run(spark, cfg, sourceDir, targetDir, t0, mode, landing)
      finally {
        try Runtime.getRuntime.removeShutdownHook(hook)
        catch { case _: IllegalStateException => () } // already shutting down
        spark.stop()
      }
    if (!correct) sys.exit(2)
  }

  /** Job-group tag every archive action runs under, so the signal hook
    * cancels exactly the archive's jobs — the per-group analogue of the
    * reference's per-process context (in the CLI deployment the process
    * owns the session, so group-cancel ≡ cancel-all; in a shared session
    * it cancels only us). interruptOnCancel interrupts task threads
    * blocked on JDBC I/O. */
  private[graft] val JobGroup = "graft-archiver"

  /** The signal hook's body, factored out so MainSpec can fire it against
    * an in-flight run: cancel the archive's Spark jobs (the
    * context-cancel analogue) and remove the staging root so no
    * half-staged batch outlives the process. Committed target files are
    * NOT touched — the idempotent copyInto tombstone protocol owns that
    * state, and a replayed batch against it is a no-op. */
  private[graft] def cancelAndSweep(spark: SparkSession,
      stagingRoot: String): Unit = {
    // Runs in a JVM shutdown hook CONCURRENTLY with Spark's own shutdown
    // hook: any SparkContext/sessionState call may see an already-stopped
    // context and throw IllegalStateException, which would abort this
    // hook before the staging sweep. The cancel is best-effort (a stopped
    // context has no jobs left to cancel) and the sweep must not depend
    // on the session — fall back to a bare Hadoop conf.
    try if (!spark.sparkContext.isStopped)
      spark.sparkContext.cancelJobGroup(JobGroup)
    catch { case _: IllegalStateException => () }
    val conf =
      try spark.sessionState.newHadoopConf()
      catch { case _: IllegalStateException =>
        new org.apache.hadoop.conf.Configuration() }
    val p = new org.apache.hadoop.fs.Path(stagingRoot)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, true): Unit
  }

  /** The CLI body minus session/process lifecycle (testable directly):
    * returns whether reconciliation passed. */
  def run(spark: SparkSession, cfg: ArchiverConfig,
      sourceDir: String, targetDir: String,
      t0: Long = System.nanoTime(), mode: String = "full",
      landing: Option[String] = None): Boolean = try {
    spark.sparkContext.setJobGroup(JobGroup, "graft archive run",
      interruptOnCancel = true)
    runBody(spark, cfg, sourceDir, targetDir, t0, mode, landing)
  } finally spark.sparkContext.clearJobGroup()

  private def runBody(spark: SparkSession, cfg: ArchiverConfig,
      sourceDir: String, targetDir: String,
      t0: Long, mode: String,
      landing: Option[String]): Boolean = {
    val archiver = landing match {
      case Some(fmt) =>
        // landing drops are schemaless text: the sink schema comes from
        // the config table's first drop (inferred once, then pinned as
        // the landing contract for the scan loop)
        val probe = new graft.source.FileTableSource(spark, sourceDir, fmt)
        val sinkSchema =
          probe.scan(new java.io.File(sourceDir).getName, cfg.sourceTable,
            Seq.empty, "").schema
        Archiver.landing(spark, cfg, sourceDir, targetDir,
          staging(targetDir), sinkSchema, fmt)
      case None =>
        // sink schema = source table schema (pre-existing warehouse table)
        val sinkSchema = spark.read
          .parquet(s"$sourceDir/${cfg.sourceTable}.parquet").schema
        Archiver.parquet(spark, cfg, sourceDir, targetDir,
          staging(targetDir), sinkSchema)
    }
    val report = mode match {
      case "full"             => archiver.run()
      case "incremental"      => archiver.runIncremental()
      case "incremental-time" => archiver.runIncrementalTime()
      case other              => sys.error(s"unknown mode: $other")
    }
    report.tables.foreach(t =>
      println(s"[archive] ${t.db}.${t.table}: ${t.rowsLoaded} rows"))
    val rc = report.reconciliation
    println(s"[reconcile] source=${rc.sourceRows} target=${rc.targetRows} " +
      s"correct=${rc.correct} deletedBack=${report.deletedBack}")
    if (report.quarantined > 0)
      println(s"[quarantine] ${report.quarantined} corrupt landing rows excluded")
    val m = report.metrics
    println(f"[metrics] read=${m.rowsRead} rows (${m.readRowsPerSec}%.0f rows/s, " +
      f"${m.readRowsPerSec10s}%.0f rows/s over the last 10s) " +
      s"written=${m.bytesWritten} bytes")
    println(f"[done] total ${(System.nanoTime() - t0) / 1e9}%.1f s")
    rc.correct
  }

  private def staging(targetDir: String): String = s"$targetDir.staging"
}
