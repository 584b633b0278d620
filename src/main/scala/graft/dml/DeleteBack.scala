package graft.dml

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.{coalesce, expr, lit, not}

/** Delete-after-sync (SURVEY.md §2 K5-K7). On MySQL the reference deletes
  * in rate-limited batches of `LIMIT min(batch, remaining)` with
  * `batchMaxInterval`-second sleeps (source/mysql.go:134-172); other
  * dialects issue one unbatched DELETE (postgres.go:174-187 etc).
  *
  * Two faces here:
  *  - [[batchPlan]] — the pure batching/pacing schedule (unit-testable,
  *    and what a JDBC executor would run statement-by-statement);
  *  - [[deleteFromParquet]] — the sandbox execution: a table rewrite
  *    keeping only the anti-predicate rows (what DELETE means for an
  *    immutable-file table; a real table format makes this transactional).
  */
object DeleteBack {

  final case class DeleteBatch(limit: Long, sleepSecondsAfter: Int)

  /** The mysql-path schedule: total rows under the predicate, deleted in
    * `min(batch, remaining)` chunks, pacing sleep between chunks. */
  def batchPlan(totalRows: Long, batchSize: Long, pacingSeconds: Int): Seq[DeleteBatch] = {
    val out = Seq.newBuilder[DeleteBatch]
    var remaining = totalRows
    while (remaining > 0) {
      val n = math.min(batchSize, remaining)
      remaining -= n
      out += DeleteBatch(n, if (remaining > 0) pacingSeconds else 0)
    }
    out.result()
  }

  /** Batched delete statements for a JDBC executor (dialect-generic). */
  def deleteSql(db: String, table: String, where: String, limit: Option[Long]): String =
    limit match {
      case Some(n) => s"DELETE FROM $db.$table WHERE $where LIMIT $n"
      case None    => s"DELETE FROM $db.$table WHERE $where"
    }

  /** Live-JDBC DML execution: one statement, returns the update count.
    * The non-mysql delete-back path is exactly one unbatched statement
    * from [[deleteSql]]; the mysql path feeds [[batchPlan]]'s LIMIT
    * batches through here one statement at a time with the pacing sleep
    * between them. Runs on the DRIVER by design — delete-back is a
    * planning-sized control action (one statement per table), never a
    * per-row distributed job. */
  def executeJdbc(url: String, props: java.util.Properties, sql: String): Long = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(sql).toLong finally st.close()
    } finally conn.close()
  }

  /** Crash recovery for [[deleteFromParquet]]'s rename-aside swap — the
    * same three states Compaction.recover repairs for the target:
    *  - table missing + `.old` present → the crash hit between the two
    *    renames: restore `.old` (the pre-delete data; the DELETE is
    *    idempotent and is simply redone by the caller);
    *  - table present + `.old` present → crash after the swap, before
    *    cleanup: the `.old` copy is obsolete, drop it;
    *  - stale `.rewrite` → never live, always safe to drop.
    * @return true when it repaired something */
  def recoverParquet(path: String): Boolean = {
    val target = new java.io.File(path)
    val old = new java.io.File(path + ".old")
    val tmp = new java.io.File(path + ".rewrite")
    var repaired = false
    if (old.exists()) {
      if (!target.exists()) {
        if (!old.renameTo(target))
          sys.error(s"delete-back recovery failed: $old -> $target")
      } else delete(old)
      repaired = true
    }
    if (tmp.exists()) { delete(tmp); repaired = true }
    repaired
  }

  /** Sandbox execution over a parquet "table": rewrite keeping every row
    * where the predicate is NOT TRUE. SQL DELETE removes only rows where
    * the predicate evaluates to TRUE — a NULL predicate (e.g. a NULL key
    * column) must KEEP the row, so the complement is
    * `NOT coalesce(pred, false)`, not `NOT pred` (NOT NULL = NULL would
    * silently drop those rows). Returns rows deleted.
    *
    * The swap is rename-ASIDE (table → `.old`, rewrite → table, drop
    * `.old`), never delete-then-rename: the live table must not be
    * deleted before its replacement is in place, or a crash in between
    * loses the only copy (the failure chain Compaction's swap closes for
    * the target, closed here for the source). [[recoverParquet]] runs
    * first so an interrupted prior swap is repaired before the rewrite
    * reads the table. */
  def deleteFromParquet(spark: SparkSession, path: String, where: String): Long = {
    recoverParquet(path): Unit
    val df = spark.read.parquet(path)
    val keep = df.where(not(coalesce(expr(where), lit(false))))
    val deleted = df.count() - keep.count()
    val tmp = path + ".rewrite"
    keep.write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new java.io.File(path)
    val old = new java.io.File(path + ".old")
    if (!target.renameTo(old))
      sys.error(s"rewrite swap failed: $path -> $old")
    if (!new java.io.File(tmp).renameTo(target))
      sys.error(s"rewrite rename failed for $path") // .old still holds the data
    delete(old)
    deleted
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete(): Unit
  }
}
