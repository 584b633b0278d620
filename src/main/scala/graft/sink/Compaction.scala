package graft.sink

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for the append target. Every staged load commits
  * its own files, so a long-running archive accumulates one file set per
  * batch — at 100 TB that is the classic small-file problem (footer reads
  * and task scheduling dominate scans). Compaction rewrites the target
  * into ~targetBytes files sized for the scan path (HDFS-block/row-group
  * scale), the same maintenance a table format's OPTIMIZE performs.
  *
  * The rewrite goes to a sibling temp dir and is swapped in afterwards —
  * on a real deployment the swap is the table format's atomic commit; on
  * the sandbox filesystem it is delete + rename (documented non-atomic
  * window, same as DeleteBack's rewrite).
  */
object Compaction {

  final case class Report(filesBefore: Int, filesAfter: Int, rows: Long)

  def compact(spark: SparkSession, targetDir: String,
      targetBytes: Long = 128L << 20): Report = {
    val dir = new java.io.File(targetDir)
    val parts = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    if (parts.isEmpty) return Report(0, 0, 0L)
    val total = parts.map(_.length()).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(targetDir)
    val tmp = targetDir.stripSuffix("/") + ".compact"
    df.repartition(n).write.mode(SaveMode.Overwrite).parquet(tmp)
    val rows = spark.read.parquet(tmp).count()
    deleteRecursively(dir)
    if (!new java.io.File(tmp).renameTo(dir))
      sys.error(s"compaction swap failed for $targetDir")
    val after = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    Report(parts.length, after, rows)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }
}
