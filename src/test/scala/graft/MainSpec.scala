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
}
