package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for the append target. Every staged load commits
  * its own files, so a long-running archive accumulates one file set per
  * batch — at 100 TB that is the classic small-file problem (footer reads
  * and task scheduling dominate scans). Compaction rewrites the target
  * into ~targetBytes files sized for the scan path (HDFS-block/row-group
  * scale), the same maintenance a table format's OPTIMIZE performs.
  *
  * Replay safety: the per-ingest `ingest-<id>.done` tombstones are carried
  * across the rewrite, so a batch replayed AFTER its data files were
  * compacted away is recognized by StagedLoader.copyInto as already
  * committed (tombstone present, no prefix files) and skipped — without
  * this, compaction would reopen the at-least-once duplication window.
  *
  * All I/O is Hadoop-FS (file://, hdfs://, s3a://). The rewrite goes to a
  * sibling temp dir and is swapped in afterwards — on a real deployment
  * the swap is the table format's atomic commit; here it is delete +
  * rename (documented non-atomic window, same as DeleteBack's rewrite).
  */
object Compaction {

  final case class Report(filesBefore: Int, filesAfter: Int, rows: Long)

  def compact(spark: SparkSession, targetDir: String,
      targetBytes: Long = 128L << 20): Report = {
    val target = new Path(targetDir)
    val fs: FileSystem = target.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(target)) return Report(0, 0, 0L)
    val entries = fs.listStatus(target).toSeq
    val parts = entries.filter(s => s.getPath.getName.endsWith(".parquet"))
    if (parts.isEmpty) return Report(0, 0, 0L)
    val tombstones = entries.map(_.getPath)
      .filter(p => p.getName.startsWith("_ingest-") && p.getName.endsWith(".done"))
    val total = parts.map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val tmp = new Path(targetDir.stripSuffix("/") + ".compact")
    // row count from the PRE-rewrite footers (metadata-weight count), not
    // a second full scan of the rewritten data
    val rows = spark.read.parquet(targetDir).count()
    spark.read.parquet(targetDir)
      .repartition(n).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // RECREATE the tombstones in tmp (they are empty markers) and leave
    // the originals in the live target until after the swap — moving them
    // out first would strip replay protection if the swap crashes, and a
    // compact() re-run's Overwrite would then wipe the only copies
    tombstones.foreach { t =>
      fs.create(new Path(tmp, t.getName), true).close()
    }
    fs.delete(target, true)
    if (!fs.rename(tmp, target))
      sys.error(s"compaction swap failed for $targetDir")
    val after = fs.listStatus(target)
      .count(_.getPath.getName.endsWith(".parquet"))
    Report(parts.length, after, rows)
  }
}
