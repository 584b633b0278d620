package graft

import java.nio.file.Files

import graft.config.ArchiverConfig
import graft.dml.DeleteBack
import graft.plan.{ArchivePlanner, KeySplitPlan}
import graft.sink.StagedLoader
import graft.source.{DerbyDialect, JdbcTableSource}

/** The flagship archival path against a LIVE JDBC engine — embedded Derby,
  * whose jars ship with Spark, so `spark.read.jdbc(url, table, predicates,
  * props)` actually executes (remote cursors, real catalog metadata, real
  * DML) with zero network egress. This is the tier the reference covers
  * with live-DBMS CI (cmd/main_test.go:25-59, ci.yaml:12-44; scan at
  * source/mysql.go:182-296): discovery, planning pushdown, the partitioned
  * predicate scan, schema probe, staged load, reconciliation, and
  * delete-back DML — none of it through the parquet stand-in.
  */
class JdbcE2ESpec extends SparkSpec {

  private val locator = "memory:graftdb"
  private def bootUrl = s"jdbc:derby:$locator;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(bootUrl)
    try f(c) finally c.close()
  }

  /** (Re-)seed ARCHDB.ORDERS_ARCHIVE with 200 rows + an empty sibling
    * table; idempotent so each test starts from the same live state. */
  private def seed(): Unit = withConn { c =>
    val st = c.createStatement()
    def tryRun(sql: String): Unit =
      try { st.execute(sql): Unit }
      catch { case _: java.sql.SQLException => () } // already exists
    tryRun("CREATE SCHEMA ARCHDB")
    tryRun("""CREATE TABLE ARCHDB.ORDERS_ARCHIVE (
             |  ID BIGINT NOT NULL PRIMARY KEY,
             |  USER_ID INT,
             |  STATUS VARCHAR(16),
             |  TS TIMESTAMP,
             |  AMOUNT DECIMAL(12,2))""".stripMargin)
    tryRun("CREATE TABLE ARCHDB.EVENTS_LOG (ID BIGINT NOT NULL PRIMARY KEY)")
    st.execute("DELETE FROM ARCHDB.ORDERS_ARCHIVE")
    st.close()
    val ps = c.prepareStatement(
      "INSERT INTO ARCHDB.ORDERS_ARCHIVE VALUES (?, ?, ?, ?, ?)")
    (1 to 200).foreach { i =>
      ps.setLong(1, i.toLong)
      ps.setInt(2, i % 17)
      ps.setString(3, Seq("open", "done", "void")(i % 3))
      ps.setTimestamp(4, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 3, 1, 0, 0, 0).plusMinutes(i.toLong)))
      ps.setBigDecimal(5, new java.math.BigDecimal(i).multiply(
        new java.math.BigDecimal("1.25")).setScale(2))
      ps.addBatch()
    }
    ps.executeBatch()
    ps.close()
  }

  private def source =
    new JdbcTableSource(spark, DerbyDialect, "", 0, "", "", locator)

  private def cfg = ArchiverConfig(
    databaseType = "derby",
    sourceDB = "ARCHDB", sourceTable = "ORDERS_ARCHIVE",
    sourceWhereCondition = "ID <= 120", sourceSplitKey = "ID",
    batchSize = 25, maxThread = 3)

  test("discovery + db@table regex expansion against live catalog metadata") {
    seed()
    val src = source
    assert(src.listDatabases().contains("ARCHDB"))
    assert(src.listTables("ARCHDB").toSet ==
      Set("ORDERS_ARCHIVE", "EVENTS_LOG"))
    assert(src.expandDbTables(Seq("ARCH.*@ORDERS.*")) ==
      Map("ARCHDB" -> Seq("ORDERS_ARCHIVE")))
  }

  test("planning aggregates push down as remote scalar queries") {
    seed()
    val src = source
    assert(src.count("ARCHDB", "ORDERS_ARCHIVE", "1=1") == 200L)
    assert(src.count("ARCHDB", "ORDERS_ARCHIVE", "ID <= 120") == 120L)
    assert(src.minMaxKey("ARCHDB", "ORDERS_ARCHIVE", "ID", "1=1") ==
      (BigInt(1), BigInt(200)))
    // empty-predicate sentinel (reference A3): MIN/MAX over zero rows
    assert(src.minMaxKey("ARCHDB", "ORDERS_ARCHIVE", "ID", "ID > 9999") ==
      (BigInt(0), BigInt(0)))
    val (mnT, mxT) = src.minMaxTime("ARCHDB", "ORDERS_ARCHIVE", "TS", "1=1")
    assert(mnT.startsWith("2024-03-01 00:01") && mxT.startsWith("2024-03-01 03:20"))
  }

  test("partitioned scan: one Spark input partition per planner predicate; " +
       "user predicate AND-composed remotely") {
    seed()
    val src = source
    val plan = ArchivePlanner.plan(src, cfg, "ARCHDB", "ORDERS_ARCHIVE")
    val preds = plan match {
      case KeySplitPlan(p, _, mn, mx) =>
        assert(mn == BigInt(1) && mx == BigInt(120)); p
      case other => fail(s"expected KeySplitPlan, got $other")
    }
    assert(preds.size > 1, s"planner must split: $preds")
    val df = src.scan("ARCHDB", "ORDERS_ARCHIVE", preds, "ID <= 120")
    // the 1000-concurrent-cursors contract: each predicate IS one Spark
    // input partition of the live JDBC relation
    assert(df.rdd.getNumPartitions == preds.size)
    assert(df.count() == 120L)
    // L4 schema probe comes free off the same relation
    assert(df.schema.fieldNames.toSeq ==
      Seq("ID", "USER_ID", "STATUS", "TS", "AMOUNT"))
    // user predicate composes with the partition predicates REMOTELY
    val even = src.scan("ARCHDB", "ORDERS_ARCHIVE", preds, "MOD(ID, 2) = 0")
    assert(even.count() == 60L)
  }

  test("full archival run: live scan -> staged load -> reconcile -> " +
       "delete-back DML mutates the source") {
    seed()
    val src = source
    val root = Files.createTempDirectory("graft-jdbc-e2e").toString
    val scanDf = src.scan("ARCHDB", "ORDERS_ARCHIVE", Seq.empty, "1=1")
    val loader = new StagedLoader(spark, s"$root/target", scanDf.schema)
    val props = new java.util.Properties()
    DerbyDialect.scanOptions.foreach { case (k, v) => props.setProperty(k, v) }
    val archiver = new Archiver(spark, cfg.copy(deleteAfterSync = true),
      src, loader, s"$root/staging", pacingSleep = _ => (),
      deleteBackFn = (db, t, where) => DeleteBack.executeJdbc(
        DerbyDialect.driverUrl("", 0, "", "", locator), props,
        DeleteBack.deleteSql(db, t, where, limit = None)))
    val report = archiver.run()
    assert(report.reconciliation.correct, report.toString)
    assert(report.reconciliation.targetRows == 120L)
    assert(report.deletedBack == 120L)
    // the live source lost exactly the archived range
    assert(src.count("ARCHDB", "ORDERS_ARCHIVE", "1=1") == 80L)
    assert(src.count("ARCHDB", "ORDERS_ARCHIVE", "ID <= 120") == 0L)
    // and the target holds it, decimal/timestamp fidelity intact
    val tgt = spark.read.schema(scanDf.schema).parquet(s"$root/target")
    assert(tgt.count() == 120L)
    assert(tgt.where("ID = 120").select("AMOUNT").head().getDecimal(0)
      .compareTo(new java.math.BigDecimal("150.00")) == 0)
    // idempotency gate (A5): a second run against the same target refuses
    val again = intercept[IllegalArgumentException](archiver.run())
    assert(again.getMessage.contains("refusing to run"))
  }

  test("incremental high-watermark sync against the live source: " +
       "initial load, source grows, delta run picks up only new keys") {
    seed() // idempotent ARCHDB bootstrap — keeps the test runnable in isolation
    withConn { c =>
      val st = c.createStatement()
      try { st.execute("DROP TABLE ARCHDB.ORDERS_DELTA"): Unit }
      catch { case _: java.sql.SQLException => () }
      st.execute("""CREATE TABLE ARCHDB.ORDERS_DELTA (
                   |  ID BIGINT NOT NULL PRIMARY KEY, V INT)""".stripMargin)
      st.close()
      val ps = c.prepareStatement("INSERT INTO ARCHDB.ORDERS_DELTA VALUES (?, ?)")
      (1 to 100).foreach { i => ps.setLong(1, i.toLong); ps.setInt(2, i * 3); ps.addBatch() }
      ps.executeBatch(); ps.close()
    }
    val src = source
    val root = Files.createTempDirectory("graft-jdbc-inc").toString
    val schema = src.scan("ARCHDB", "ORDERS_DELTA", Seq.empty, "1=1").schema
    val loader = new StagedLoader(spark, s"$root/target", schema,
      orderedCommitKey = Some("ID"))
    val icfg = cfg.copy(sourceTable = "ORDERS_DELTA",
      sourceWhereCondition = "ID >= 1", batchSize = 40)
    val archiver = new Archiver(spark, icfg, src, loader, s"$root/staging",
      pacingSleep = _ => ())
    val r1 = archiver.runIncremental()
    assert(r1.reconciliation.correct && r1.reconciliation.targetRows == 100L)
    assert(loader.maxKey("ID").contains(BigInt(100)))
    // the source grows; the delta run must load ONLY keys past the watermark
    withConn { c =>
      val ps = c.prepareStatement("INSERT INTO ARCHDB.ORDERS_DELTA VALUES (?, ?)")
      (101 to 150).foreach { i => ps.setLong(1, i.toLong); ps.setInt(2, i * 3); ps.addBatch() }
      ps.executeBatch(); ps.close()
    }
    val r2 = archiver.runIncremental()
    assert(r2.reconciliation.correct && r2.reconciliation.targetRows == 150L)
    assert(r2.tables.map(_.rowsLoaded).sum == 50L,
      s"delta run must load only the 50 new rows: $r2")
    assert(loader.maxKey("ID").contains(BigInt(150)))
    // no duplicates through the two staged commits
    val tgt = spark.read.schema(schema).parquet(s"$root/target")
    assert(tgt.count() == 150L)
    assert(tgt.select("ID").distinct().count() == 150L)
  }

  test("time-split archival + time-incremental sync against the live source " +
       "(dialect-typed timestamp literals)") {
    def insertRows(range: Range, baseSec: Int): Unit = withConn { c =>
      val ps = c.prepareStatement("INSERT INTO ARCHDB.EVENTS_TS VALUES (?, ?, ?)")
      range.foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setTimestamp(2, java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2024, 3, 1, 0, 0, 0)
            .plusSeconds(baseSec + (i - range.head) * 30L)))
        ps.setInt(3, i)
        ps.addBatch()
      }
      ps.executeBatch(); ps.close()
    }
    seed() // idempotent ARCHDB bootstrap — keeps the test runnable in isolation
    withConn { c =>
      val st = c.createStatement()
      try { st.execute("DROP TABLE ARCHDB.EVENTS_TS"): Unit }
      catch { case _: java.sql.SQLException => () }
      st.execute("""CREATE TABLE ARCHDB.EVENTS_TS (
                   |  ID BIGINT NOT NULL PRIMARY KEY, TS TIMESTAMP, V INT)""".stripMargin)
      st.close()
    }
    insertRows(1 to 60, 0) // 30 minutes of 30 s ticks
    val src = source
    val root = Files.createTempDirectory("graft-jdbc-ts").toString
    val schema = src.scan("ARCHDB", "EVENTS_TS", Seq.empty, "1=1").schema
    val loader = new StagedLoader(spark, s"$root/target", schema,
      orderedCommitKey = Some("TS"))
    val tcfg = cfg.copy(sourceTable = "EVENTS_TS",
      sourceWhereCondition = "ID >= 1",
      sourceSplitKey = "", sourceSplitTimeKey = "TS",
      timeSplitUnit = "minute", batchMaxInterval = 0, maxThread = 1)
    // the plan the live engine will execute: 10-minute tumbling windows
    // with Derby's TIMESTAMP('...') literals (bare strings don't compare
    // against TIMESTAMP columns on strict-typing engines)
    ArchivePlanner.plan(src, tcfg, "ARCHDB", "EVENTS_TS") match {
      case graft.plan.TimeSplitPlan(ws) =>
        assert(ws.size == 4, ws.toString) // 3 real windows + degenerate tail
        assert(ws.head.contains("TIMESTAMP('2024-03-01 00:00:00')"), ws.head)
      case other => fail(s"expected TimeSplitPlan, got $other")
    }
    val archiver = new Archiver(spark, tcfg, src, loader, s"$root/staging",
      pacingSleep = _ => ())
    val r1 = archiver.run()
    assert(r1.reconciliation.correct && r1.reconciliation.targetRows == 60L)
    // µs-precision time watermark, then a live delta over the typed literal
    assert(loader.maxTime("TS").contains("2024-03-01 00:29:30.000000"))
    insertRows(61 to 70, 30 * 60)
    val r2 = archiver.runIncrementalTime()
    assert(r2.reconciliation.correct && r2.reconciliation.targetRows == 70L)
    assert(r2.tables.map(_.rowsLoaded).sum == 10L,
      s"time-delta run must load only the 10 new rows: $r2")
    val tgt = spark.read.schema(schema).parquet(s"$root/target")
    assert(tgt.count() == 70L && tgt.select("ID").distinct().count() == 70L)
  }

  test("multi-schema db@table regex archives several LIVE tables into one " +
       "target: summed reconciliation, NULL wave intact") {
    // The reference's multi-table loop (cmd/main.go:83-101) with its
    // two-wave seed shape (cmd/main_test.go:448-510): wave 1 is fully
    // populated, wave 2 (ids i*11+100) NULLs int/varchar/timestamp on odd
    // i. Two schemas of different sizes so the summed golden counts
    // (cmd/main_test.go:852-895) can't pass by accident, and the two
    // tables carry OVERLAPPING id ranges — the shared target must keep
    // both copies and reconcile on the SUM, not a distinct count.
    def seedWave(db: String, wave2N: Int): Unit = withConn { c =>
      val st = c.createStatement()
      def tryRun(sql: String): Unit =
        try { st.execute(sql): Unit }
        catch { case _: java.sql.SQLException => () }
      tryRun(s"CREATE SCHEMA $db")
      tryRun(s"DROP TABLE $db.ORDERS_WAVE")
      st.execute(s"""CREATE TABLE $db.ORDERS_WAVE (
                    |  ID BIGINT NOT NULL PRIMARY KEY,
                    |  INT_COL INT,
                    |  VARCHAR_COL VARCHAR(32),
                    |  TS TIMESTAMP)""".stripMargin)
      st.close()
      val ps = c.prepareStatement(
        s"INSERT INTO $db.ORDERS_WAVE VALUES (?, ?, ?, ?)")
      val base = java.time.LocalDateTime.of(2024, 3, 1, 0, 0, 0)
      def ts(i: Int) = java.sql.Timestamp.valueOf(base.plusMinutes(i.toLong))
      (1 to 10).foreach { i =>
        ps.setLong(1, i.toLong); ps.setInt(2, i)
        ps.setString(3, s"varchar $i"); ps.setTimestamp(4, ts(i))
        ps.addBatch()
      }
      (1 to wave2N).foreach { i =>
        ps.setLong(1, i * 11L + 100L)
        if (i % 2 == 1) {
          ps.setNull(2, java.sql.Types.INTEGER)
          ps.setNull(3, java.sql.Types.VARCHAR)
          ps.setNull(4, java.sql.Types.TIMESTAMP)
        } else {
          ps.setInt(2, i); ps.setString(3, s"varchar ${i * 11}")
          ps.setTimestamp(4, ts(i))
        }
        ps.addBatch()
      }
      ps.executeBatch(); ps.close()
    }
    seedWave("WAVEDB1", 10) // 20 rows, 5 NULL-wave rows
    seedWave("WAVEDB2", 5)  // 15 rows, 3 NULL-wave rows
    val src = source
    val root = Files.createTempDirectory("graft-jdbc-multi").toString
    val mcfg = ArchiverConfig(
      databaseType = "derby",
      sourceDbTables = Seq("WAVEDB.*@ORDERS.*"),
      sourceWhereCondition = "ID >= 1", sourceSplitKey = "ID",
      batchSize = 7, maxThread = 3)
    val schema = src.scan("WAVEDB1", "ORDERS_WAVE", Seq.empty, "1=1").schema
    val loader = new StagedLoader(spark, s"$root/target", schema)
    val archiver = new Archiver(spark, mcfg, src, loader, s"$root/staging",
      pacingSleep = _ => ())
    val r = archiver.run()
    assert(r.tables.map(t => (t.db, t.table, t.rowsLoaded)).toSet ==
      Set(("WAVEDB1", "ORDERS_WAVE", 20L), ("WAVEDB2", "ORDERS_WAVE", 15L)),
      r.toString)
    assert(r.reconciliation.correct, r.toString)
    assert(r.reconciliation.sourceRows == 35L &&
           r.reconciliation.targetRows == 35L, r.toString)
    val tgt = spark.read.schema(schema).parquet(s"$root/target")
    assert(tgt.count() == 35L)
    // overlapping ids stayed duplicated (two tables' worth), not merged
    assert(tgt.where("ID = 5").count() == 2L)
    // the NULL wave survived the staged NDJSON hop: 5 + 3 all-NULL rows,
    // and NULLs never leaked into wave 1
    assert(tgt.where("INT_COL IS NULL AND VARCHAR_COL IS NULL AND TS IS NULL")
      .count() == 8L)
    assert(tgt.where("ID <= 10 AND INT_COL IS NULL").count() == 0L)
    // fidelity of a populated wave-2 row through the text staging
    assert(tgt.where("ID = 122 AND VARCHAR_COL = 'varchar 22'").count() == 2L)
  }
}
