package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source abstraction: a catalog of (db, table) relations plus the planning
  * aggregates and the partitioned scan. Two implementations:
  *
  *  - [[JdbcTableSource]] — the production path: `spark.read.jdbc(url,
  *    table, predicates, props)` turns each planner predicate into one Spark
  *    input partition (1000 executors ⇒ 1000 concurrent remote cursors,
  *    bounded by the predicate count). Planning aggregates push down as
  *    remote scalar queries.
  *  - [[ParquetTableSource]] — the fixture path (no live RDBMS in the
  *    sandbox): a directory of parquet files is a database; predicates
  *    become partition filters on the same relation. Lets every layer above
  *    (catalog regex, planner, loader, reconciler, delete-back) run and be
  *    tested for real.
  */
trait TableSource {
  def listDatabases(): Seq[String]
  def listTables(db: String): Seq[String]

  /** `dbRegex@tableRegex` expansion (SURVEY.md §2 S8): unanchored match,
    * like Go's regexp.MatchString. */
  def expandDbTables(patterns: Seq[String]): Map[String, Seq[String]] = {
    val dbs = listDatabases()
    patterns.flatMap { p =>
      val Array(dbRe, tblRe) = p.split("@", 2)
      dbs.filter(db => dbRe.r.findFirstIn(db).isDefined).map { db =>
        db -> listTables(db).filter(t => tblRe.r.findFirstIn(t).isDefined)
      }
    }.groupBy(_._1).map { case (db, ts) =>
      db -> ts.flatMap(_._2).distinct.toSeq
    }
  }

  /** Full-row scan of one partition predicate AND the user predicate. */
  def scan(db: String, table: String, predicates: Seq[String], userPred: String): DataFrame

  def count(db: String, table: String, where: String): Long
  def minMaxKey(db: String, table: String, key: String, where: String): (BigInt, BigInt)
  def minMaxTime(db: String, table: String, key: String, where: String): (String, String)

  /** Rows this source EXCLUDED from the scan under its corrupt-record
    * policy (landing zones quarantine unparseable lines); surfaced in the
    * run report so truncation is never silent. Structured sources have
    * nothing to quarantine. */
  def quarantined(db: String, table: String): Long = 0L

  /** Render a `yyyy-MM-dd HH:mm:ss[.SSSSSS]` timestamp as a literal this
    * source's engine compares against a timestamp column. The ANSI typed
    * form is the default (Spark, mysql, pg, oracle all accept it);
    * dialects with their own syntax override via their profile. */
  def timestampLiteral(ts: String): String = s"TIMESTAMP '$ts'"
}

/** Shared implementation for sources whose tables materialize as Spark
  * DataFrames (parquet fixtures, file landing zones): the planning
  * aggregates and the predicate scan run through Catalyst on the same
  * relation — predicates become partition filters instead of remote
  * cursors, everything above (catalog regex, planner, loader, reconciler,
  * delete-back) is source-agnostic. */
trait DataFrameTableSource extends TableSource {
  protected def table(t: String): DataFrame

  override def scan(db: String, t: String, predicates: Seq[String],
      userPred: String): DataFrame = {
    val base = table(t).where(if (userPred.isEmpty) "true" else userPred)
    if (predicates.isEmpty) base
    else base.where(predicates.map(p => s"($p)").mkString(" OR "))
  }

  override def count(db: String, t: String, where: String): Long =
    table(t).where(where).count()

  override def minMaxKey(db: String, t: String, key: String, where: String): (BigInt, BigInt) = {
    val r = table(t).where(where)
      .agg(min(col(key)).cast("decimal(20,0)"), max(col(key)).cast("decimal(20,0)")).head()
    if (r.isNullAt(0)) (BigInt(0), BigInt(0)) // empty-table sentinel (reference A3)
    else (BigInt(r.getDecimal(0).toBigInteger), BigInt(r.getDecimal(1).toBigInteger))
  }

  override def minMaxTime(db: String, t: String, key: String, where: String): (String, String) = {
    val r = table(t).where(where)
      .agg(date_format(min(col(key)), "yyyy-MM-dd HH:mm:ss"),
           date_format(max(col(key)), "yyyy-MM-dd HH:mm:ss")).head()
    (Option(r.getString(0)).getOrElse(""), Option(r.getString(1)).getOrElse(""))
  }
}

/** Parquet-backed source: `rootDir/<table>.parquet`, database name = the
  * directory's base name. */
class ParquetTableSource(spark: SparkSession, rootDir: String)
    extends DataFrameTableSource {
  private val dir = new java.io.File(rootDir)
  private val dbName = dir.getName

  override def listDatabases(): Seq[String] = Seq(dbName)

  override def listTables(db: String): Seq[String] =
    if (db != dbName) Seq.empty
    else dir.listFiles((_, n) => n.endsWith(".parquet")).toSeq
      .map(_.getName.stripSuffix(".parquet")).sorted

  protected def table(t: String): DataFrame =
    spark.read.parquet(s"$rootDir/$t.parquet")
}

/** File-landing-zone source: `rootDir/<table>.<json|csv>[.gz]` — the
  * ingestion topology where an upstream producer drops NDJSON or CSV
  * batches in a landing directory and the archiver sweeps them into the
  * warehouse. Table schemas come from the landing CONTRACT when provided
  * (the production shape — text formats carry no types; µs-precision
  * timestamps parse via the same `timestampFormat` the staged loader
  * writes), else from inference (one extra planning-time pass, fine for
  * exploration, not for the scan loop). Everything above the relation —
  * catalog regex, key/time-split planning, staged load, reconciliation —
  * is inherited unchanged from [[DataFrameTableSource]].
  *
  * Robustness (a production landing zone is untrusted producer output):
  *
  *  - gzip drops (`.json.gz` / `.csv.gz`) read transparently — Spark's
  *    text source picks the codec from the extension. A gz file is not
  *    splittable, so scan parallelism is the file count: exactly the
  *    shape landing producers deliver (many per-batch drops), not a
  *    problem the archiver needs to solve.
  *  - corrupt-record policy (contract-schema path): lines that fail to
  *    parse land in a `_corrupt_record` audit column, are EXCLUDED from
  *    the archived scan, and are counted per table via [[quarantined]]
  *    so the run report can surface exactly how many rows were left
  *    behind — the same classified-error discipline the reference's
  *    loader applies (ingester/ingest_databend.go:25-29). A malformed
  *    line must neither silently become nulls nor fail the whole sweep.
  *
  * The parse is deliberately `text` + `from_json`/`from_csv`, not the
  * json/csv file source: Spark disallows file-source queries whose
  * required schema is only the corrupt column (JsonFileFormat/
  * CSVFileFormat), which is precisely what reconciliation's `count()`
  * over the corrupt-filtered relation prunes to. Parsing as an ordinary
  * projection over a text scan keeps every count/filter shape legal, at
  * the same cost (json can't push predicates anyway). */
final class FileTableSource(spark: SparkSession, rootDir: String,
    format: String = "json",
    schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
    extends DataFrameTableSource {
  require(Set("json", "csv")(format), s"unsupported landing format: $format")
  import FileTableSource.CorruptCol
  private val dir = new java.io.File(rootDir)
  private val dbName = dir.getName
  private val suffixes = Seq(s".$format", s".$format.gz")

  // contract schemas never include the audit column itself (an inference
  // probe over a dirty landing file CAN include it — inference appends
  // columnNameOfCorruptRecord when it meets malformed records)
  private val dataSchemas: Map[String, org.apache.spark.sql.types.StructType] =
    schemas.view.mapValues(sc =>
      org.apache.spark.sql.types.StructType(sc.filterNot(_.name == CorruptCol)))
      .toMap

  override def listDatabases(): Seq[String] = Seq(dbName)

  override def listTables(db: String): Seq[String] =
    if (db != dbName) Seq.empty
    else dir.listFiles((_, n) => suffixes.exists(n.endsWith)).toSeq
      .map(n => suffixes.foldLeft(n.getName)(_.stripSuffix(_))).distinct.sorted

  private def pathOf(t: String): String = {
    val present = suffixes.map(sfx => s"$rootDir/$t$sfx")
      .filter(p => new java.io.File(p).exists())
    // both plain and gzip drops present would force a silent choice —
    // whichever we picked, the other file's rows would be neither
    // archived nor quarantined. Refuse loudly; the producer owns the
    // landing contract (one suffix per table).
    require(present.size <= 1,
      s"ambiguous landing drop for table '$t': ${present.mkString(" AND ")} " +
        "— plain and gzip forms both present; remove one (reading either " +
        "alone would silently omit the other's rows)")
    present.headOption.getOrElse(s"$rootDir/$t.$format")
  }

  private def parseOptions: Map[String, String] = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> CorruptCol,
    "timestampFormat" -> graft.sink.StagedLoader.MicrosTimestampFormat)

  /** A line is header-SHAPED when its CSV tokens — dequoted by the same
    * parser the data path uses, trimmed, case-folded — are exactly the
    * contract's field names in order. Tolerating render variants
    * (quoted fields, padding, case) matters both ways: a quoted header
    * must not be parsed as a data row NOR miscounted as a quarantined
    * corrupt row, and the match must be per-line because a landing
    * "file" can be a directory of part files, each carrying its own
    * header. (The residual ambiguity — a data row whose every field
    * literally equals its column name — is unresolvable in headered
    * CSV itself, and under a typed contract such a row would fail the
    * parse anyway for any non-string column.) */
  private def headerShaped(sc: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Column = {
    val strSchema = org.apache.spark.sql.types.StructType(sc.fieldNames.map(
      org.apache.spark.sql.types.StructField(_, org.apache.spark.sql.types.StringType)))
    val toks = from_csv(col("value"), strSchema, Map("mode" -> "PERMISSIVE"))
    sc.fieldNames.map(f =>
      lower(trim(toks.getField(f))) === lit(f.toLowerCase)).reduce(_ && _)
  }

  /** Contract-schema parse with the audit column: every non-blank line
    * becomes one row, malformed ones carrying their raw text in
    * `_corrupt_record` (and nothing else). CSV header-shaped lines are
    * dropped per line (see [[headerShaped]]) and never enter the
    * quarantine count. */
  private def parsedWithAudit(t: String,
      sc: org.apache.spark.sql.types.StructType): DataFrame = {
    val pSchema = sc.add(CorruptCol, org.apache.spark.sql.types.StringType)
    val lines = spark.read.text(pathOf(t))
      .where(length(trim(col("value"))) > 0)
    val parsed = format match {
      case "json" =>
        lines.select(from_json(col("value"), pSchema, parseOptions).as("r"),
          col("value"))
      case "csv" =>
        lines.where(!headerShaped(sc))
          .select(from_csv(col("value"), pSchema, parseOptions).as("r"),
            col("value"))
    }
    // from_json yields a NULL struct (not a corrupt-marked row) for
    // unparseable lines; normalize both shapes to "all fields null,
    // corrupt = raw line" so the audit count sees every bad line.
    parsed.select(
      (sc.fieldNames.map(f =>
        when(col("r").isNotNull && col(s"r.$CorruptCol").isNull, col(s"r.$f"))
          .as(f)) :+
        when(col("r").isNull || col(s"r.$CorruptCol").isNotNull,
          col("value")).as(CorruptCol)): _*)
  }

  // quarantine counts memoized per (table, file signature): the landing
  // file is immutable between producer drops, so the corrupt-line count
  // is a pure function of (path, length, mtime). Without the memo a run
  // re-parses the entire drop once for reconciliation's count() and AGAIN
  // for the quarantine audit — one full extra scan per table per run.
  // count() below fills the memo as a side effect of the pass it already
  // makes, so the audit read is usually free.
  private val quarantineMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  private def fileSig(t: String): String = {
    val f = new java.io.File(pathOf(t))
    def walk(x: java.io.File): Seq[java.io.File] =
      if (x.isDirectory) x.listFiles().toSeq.sortBy(_.getName).flatMap(walk)
      else Seq(x)
    walk(f).map(x => s"${x.getPath}:${x.length}:${x.lastModified}").mkString("|")
  }

  /** Valid-row count under `where` and the corrupt-line count, from ONE
    * parse of the landing drop. */
  private def countBoth(t: String,
      sc: org.apache.spark.sql.types.StructType, where: String): (Long, Long) = {
    val w = if (where.isEmpty) "true" else where
    val r = parsedWithAudit(t, sc).agg(
      org.apache.spark.sql.functions.count(
        when(col(CorruptCol).isNull && expr(w), 1)),
      org.apache.spark.sql.functions.count(
        when(col(CorruptCol).isNotNull, 1))).head()
    (r.getLong(0), r.getLong(1))
  }

  override def count(db: String, t: String, where: String): Long =
    dataSchemas.get(t) match {
      case Some(sc) =>
        val (valid, corrupt) = countBoth(t, sc, where)
        quarantineMemo.put(t, (fileSig(t), corrupt))
        valid
      case None => super.count(db, t, where)
    }

  /** Rows this table's landing drop contains that FAILED the contract
    * parse — quarantined out of the archived scan, surfaced in the run
    * report. Zero on the inference path (no contract to violate). */
  override def quarantined(db: String, t: String): Long = dataSchemas.get(t) match {
    case Some(sc) =>
      val sig = fileSig(t)
      val cached = quarantineMemo.get(t)
      if (cached != null && cached._1 == sig) cached._2
      else {
        val n = parsedWithAudit(t, sc)
          .where(col(CorruptCol).isNotNull).count()
        quarantineMemo.put(t, (sig, n))
        n
      }
    case None => 0L
  }

  protected def table(t: String): DataFrame = dataSchemas.get(t) match {
    case Some(sc) =>
      parsedWithAudit(t, sc).where(col(CorruptCol).isNull).drop(CorruptCol)
    case None =>
      // exploration path: schema inference (timestamps opted in — the
      // default infers them as strings, which would silently turn a
      // time-split watermark into string comparison). Inference over a
      // dirty file appends the corrupt column; drop it so the probed
      // schema is a clean sink contract (rows stay unfiltered here — the
      // scan loop re-reads under the pinned contract, corrupt-aware).
      val r = spark.read
        .option("timestampFormat", graft.sink.StagedLoader.MicrosTimestampFormat)
        .option("inferTimestamp", "true")
      (format match {
        case "json" => r.json(pathOf(t))
        case "csv"  => r.option("header", "true").option("inferSchema", "true")
          .csv(pathOf(t))
      }).drop(CorruptCol)
  }
}

object FileTableSource {
  /** Audit-column name for quarantined landing rows. */
  val CorruptCol = "_corrupt_record"
}

/** JDBC-backed source for a real deployment: catalog queries and planning
  * aggregates go through single-row JDBC reads; the data scan hands the
  * planner's predicate array to spark.read.jdbc — one predicate per Spark
  * partition. (Not exercised in the sandbox: zero egress, no RDBMS.) */
final class JdbcTableSource(spark: SparkSession, dialect: JdbcDialect,
    host: String, port: Int, user: String, pass: String, defaultDb: String)
    extends TableSource {

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    dialect.scanOptions.foreach { case (k, v) => p.setProperty(k, v) }
    dialect.credentialOptions(user, pass).foreach { case (k, v) => p.setProperty(k, v) }
    p
  }
  private def url: String = dialect.driverUrl(host, port, user, pass, defaultDb)

  private def sqlQuery(q: String): DataFrame =
    spark.read.jdbc(url, s"($q) graft_sub", props)

  override def listDatabases(): Seq[String] =
    sqlQuery(dialect.listDatabasesSql).collect().map(_.getString(0)).toSeq

  override def listTables(db: String): Seq[String] =
    sqlQuery(dialect.listTablesSql(db)).collect().map(_.getString(0)).toSeq

  override def scan(db: String, table: String, predicates: Seq[String],
      userPred: String): DataFrame = {
    val preds =
      if (userPred.isEmpty) predicates.toArray
      else predicates.map(p => s"$p AND ($userPred)").toArray
    if (preds.isEmpty)
      spark.read.jdbc(url, dialect.qualify(db, table), props)
        .where(if (userPred.isEmpty) "true" else userPred)
    else spark.read.jdbc(url, dialect.qualify(db, table), preds, props)
  }

  override def count(db: String, table: String, where: String): Long =
    sqlQuery(dialect.countSql(db, table, where)).head().getLong(0)

  override def minMaxKey(db: String, table: String, key: String, where: String): (BigInt, BigInt) = {
    val r = sqlQuery(dialect.minMaxSql(key, db, table, where)).head()
    if (r.isNullAt(0)) (BigInt(0), BigInt(0))
    else (BigInt(r.get(0).toString), BigInt(r.get(1).toString))
  }

  override def minMaxTime(db: String, table: String, key: String, where: String): (String, String) = {
    val r = sqlQuery(dialect.minMaxTimeSql(key, db, table, where)).head()
    (Option(r.get(0)).map(_.toString).getOrElse(""),
     Option(r.get(1)).map(_.toString).getOrElse(""))
  }

  override def timestampLiteral(ts: String): String = dialect.timestampLiteral(ts)
}
