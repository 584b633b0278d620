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

/** File-landing-zone source: `rootDir/<table>.<json|csv>` — the ingestion
  * topology where an upstream producer drops NDJSON or CSV batches in a
  * landing directory and the archiver sweeps them into the warehouse.
  * Table schemas come from the landing CONTRACT when provided (the
  * production shape — text formats carry no types; µs-precision
  * timestamps parse via the same `timestampFormat` the staged loader
  * writes), else from inference (one extra planning-time pass, fine for
  * exploration, not for the scan loop). Everything above the relation —
  * catalog regex, key/time-split planning, staged load, reconciliation —
  * is inherited unchanged from [[DataFrameTableSource]]. */
final class FileTableSource(spark: SparkSession, rootDir: String,
    format: String = "json",
    schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
    extends DataFrameTableSource {
  require(Set("json", "csv")(format), s"unsupported landing format: $format")
  private val dir = new java.io.File(rootDir)
  private val dbName = dir.getName

  override def listDatabases(): Seq[String] = Seq(dbName)

  override def listTables(db: String): Seq[String] =
    if (db != dbName) Seq.empty
    else dir.listFiles((_, n) => n.endsWith(s".$format")).toSeq
      .map(_.getName.stripSuffix(s".$format")).sorted

  protected def table(t: String): DataFrame = {
    val path = s"$rootDir/$t.$format"
    var r = spark.read
      .option("timestampFormat", graft.sink.StagedLoader.MicrosTimestampFormat)
    r = schemas.get(t) match {
      case Some(sc) => r.schema(sc)
      case None if format == "csv" => r.option("inferSchema", "true")
      case None => r
    }
    format match {
      case "json" => r.json(path)
      case "csv"  => r.option("header", "true").csv(path)
    }
  }
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
