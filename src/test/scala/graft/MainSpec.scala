package graft

import java.nio.file.Files

import graft.config.ArchiverConfig

/** CLI-path e2e: the reference JSON config format → Main.run → golden
  * count on the target (O5 in COVERAGE.md, previously only hand-driven). */
class MainSpec extends SparkSpec {

  test("Main.run archives per a JSON config and reconciles") {
    val srcDir = Files.createTempDirectory("graft-main-src").toString
    val tgt = Files.createTempDirectory("graft-main-tgt").toString + "/t"
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").parquet(s"$srcDir/orders.parquet")
    val db = new java.io.File(srcDir).getName
    val json =
      s"""{
         |  "sourceDB": "$db",
         |  "sourceTable": "orders",
         |  "sourceWhereCondition": "o_totalprice > 5000",
         |  "sourceSplitKey": "o_orderkey",
         |  "batchSize": 500,
         |  "maxThread": 4
         |}""".stripMargin
    val cfg = ArchiverConfig.fromJson(json)
      .fold(e => fail(s"config parse: $e"), identity)
    assert(Main.run(spark, cfg, srcDir, tgt))
    val expected = spark.read.parquet(s"$srcDir/orders.parquet")
      .where("o_totalprice > 5000").count()
    assert(spark.read.parquet(tgt).count() == expected)
  }

  test("Main.run --landing json: CLI archives an NDJSON landing zone") {
    val srcDir = Files.createTempDirectory("graft-main-landing").toString
    val tgt = Files.createTempDirectory("graft-main-ltgt").toString + "/t"
    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").json(s"$srcDir/orders.json")
    val db = new java.io.File(srcDir).getName
    val json =
      s"""{
         |  "sourceDB": "$db",
         |  "sourceTable": "orders",
         |  "sourceWhereCondition": "o_totalprice > 5000",
         |  "sourceSplitKey": "o_orderkey",
         |  "batchSize": 500,
         |  "maxThread": 4
         |}""".stripMargin
    val cfg = ArchiverConfig.fromJson(json)
      .fold(e => fail(s"config parse: $e"), identity)
    assert(Main.run(spark, cfg, srcDir, tgt, landing = Some("json")))
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .where("o_totalprice > 5000").count()
    assert(spark.read.parquet(tgt).count() == expected)
  }

  test("Main.run --landing + incremental-time: inferred schema carries a real timestamp") {
    // the CLI landing probe infers the sink schema from the first drop;
    // without inferTimestamp the ts column would infer as STRING and the
    // time watermark would silently compare strings (advisor finding) —
    // this pins the inferred contract end-to-end through a time delta
    val srcDir = Files.createTempDirectory("graft-main-lts").toString
    val tgt = Files.createTempDirectory("graft-main-lts-tgt").toString + "/t"
    val events = graft.ops.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type")
    val cut = events.selectExpr("timestamp_micros(CAST(percentile_disc(0.5) " +
      "WITHIN GROUP (ORDER BY unix_micros(ts)) AS BIGINT)) AS c")
      .head().getTimestamp(0)
    def dump(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("append")
        .option("timestampFormat", graft.sink.StagedLoader.MicrosTimestampFormat)
        .json(s"$srcDir/events.json")
    dump(events.where(org.apache.spark.sql.functions.col("ts") <= cut))
    val db = new java.io.File(srcDir).getName
    val cfg = ArchiverConfig.fromJson(
      s"""{
         |  "sourceDB": "$db",
         |  "sourceTable": "events",
         |  "sourceWhereCondition": "ts >= '1970-01-01 00:00:00' and ts <= '2100-01-01 00:00:00'",
         |  "sourceSplitTimeKey": "ts",
         |  "timeSplitUnit": "day",
         |  "batchSize": 100000,
         |  "maxThread": 1
         |}""".stripMargin).fold(e => fail(s"config parse: $e"), identity)
    assert(Main.run(spark, cfg, srcDir, tgt, mode = "incremental-time",
      landing = Some("json")))
    val tgtDf = spark.read.parquet(tgt)
    assert(tgtDf.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"landing probe must infer ts as TIMESTAMP, got ${tgtDf.schema}")
    val n1 = events.where(org.apache.spark.sql.functions.col("ts") <= cut).count()
    assert(tgtDf.count() == n1)
    // second drop past the watermark sweeps only the delta
    dump(events.where(org.apache.spark.sql.functions.col("ts") > cut))
    assert(Main.run(spark, cfg, srcDir, tgt, mode = "incremental-time",
      landing = Some("json")))
    val after = spark.read.parquet(tgt)
    assert(after.count() == events.count())
    assert(after.select("event_id").distinct().count() == events.count(),
      "µs watermark must not re-load the boundary instant")
  }

  test("Main.run incremental mode: initial load, then a no-op delta") {
    val srcDir = Files.createTempDirectory("graft-main-src").toString
    val tgt = Files.createTempDirectory("graft-main-tgt").toString + "/t"
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").parquet(s"$srcDir/orders.parquet")
    val db = new java.io.File(srcDir).getName
    val cfg = ArchiverConfig.fromJson(
      s"""{
         |  "sourceDB": "$db",
         |  "sourceTable": "orders",
         |  "sourceWhereCondition": "o_totalprice > 5000",
         |  "sourceSplitKey": "o_orderkey",
         |  "batchSize": 500,
         |  "maxThread": 4
         |}""".stripMargin).fold(e => fail(s"config parse: $e"), identity)
    // first delta run over an empty target = the initial full load
    assert(Main.run(spark, cfg, srcDir, tgt, mode = "incremental"))
    val expected = spark.read.parquet(s"$srcDir/orders.parquet")
      .where("o_totalprice > 5000").count()
    assert(spark.read.parquet(tgt).count() == expected)
    // second delta run: nothing new at the source → still correct, no dupes
    // (the full-archive mode would refuse here via the idempotency gate)
    assert(Main.run(spark, cfg, srcDir, tgt, mode = "incremental"))
    assert(spark.read.parquet(tgt).count() == expected)
  }

  test("SIGTERM analogue: cancel hook mid-run, incremental recovery is exact") {
    // the signal path (reference cmd/main.go:29-35): the shutdown hook
    // fires Main.cancelAndSweep against an IN-FLIGHT archive — jobs
    // cancelled, staging root swept at an arbitrary instant — and the
    // process dies. Recovery is the incremental mode resuming from the
    // committed-key watermark (ascending-key commit order makes any
    // interruption leave a key-prefix). The assertion: whatever instant
    // the hook hit, the recovered target holds EXACTLY one copy of every
    // matching source row.
    val srcDir = Files.createTempDirectory("graft-main-sig-src").toString
    val tgt = Files.createTempDirectory("graft-main-sig-tgt").toString + "/t"
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").parquet(s"$srcDir/orders.parquet")
    val db = new java.io.File(srcDir).getName
    val cfg = ArchiverConfig.fromJson(
      s"""{
         |  "sourceDB": "$db",
         |  "sourceTable": "orders",
         |  "sourceWhereCondition": "o_totalprice > 5000",
         |  "sourceSplitKey": "o_orderkey",
         |  "batchSize": 50,
         |  "maxThread": 2
         |}""".stripMargin).fold(e => fail(s"config parse: $e"), identity)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val th = new Thread(() => {
      // the interrupted process: outcome irrelevant (it would be SIGKILLed
      // dead in production) — only the on-disk state it leaves matters
      try { Main.run(spark, cfg, srcDir, tgt, mode = "incremental"); () }
      catch { case _: Throwable => () }
      finally done.set(true)
    }, "graft-sig-run")
    th.start()
    // fire the hook once the run is genuinely in flight (first committed
    // target file) — or immediately at thread end if it outran the poll
    val fs = new org.apache.hadoop.fs.Path(tgt)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!done.get() && !fs.exists(new org.apache.hadoop.fs.Path(tgt))
        && System.nanoTime() < deadline) Thread.sleep(5)
    Main.cancelAndSweep(spark, s"$tgt.staging")
    th.join(180000)
    assert(!th.isAlive, "interrupted run thread must terminate")
    // fresh process, same config: the delta run resumes from the watermark
    assert(Main.run(spark, cfg, srcDir, tgt, mode = "incremental"))
    val src = spark.read.parquet(s"$srcDir/orders.parquet")
      .where("o_totalprice > 5000")
    val got = spark.read.parquet(tgt)
    assert(got.count() == src.count(), "recovery must not lose rows")
    assert(got.select("o_orderkey").distinct().count() == src.count(),
      "no half-committed batch may survive as duplicates")
  }
}
