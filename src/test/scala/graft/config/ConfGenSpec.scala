package graft.config

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ConfGen

class ConfGenSpec extends AnyFunSuite {

  private val template =
    """{
      |  "databaseType": "mysql",
      |  "sourceWhereCondition": "overwritten",
      |  "sourceSplitTimeKey": "t1",
      |  "timeSplitUnit": "hour",
      |  "batchSize": 20000,
      |  "maxThread": 1
      |}""".stripMargin
  private val now = LocalDateTime.of(2024, 3, 15, 10, 30, 0)

  test("day/week/month windows are now-relative, query and target rewritten") {
    val Right(day) = ConfGen.generate(template, "db1", "t1", "tgt.t", "day", now)
    assert(day.contains("\"sourceWhereCondition\" : \"t1 >= '2024-03-14 10:30:00' AND t1 < '2024-03-15 10:30:00'\""))
    assert(day.contains("\"sourceQuery\" : \"select * from db1.t1\""))
    assert(day.contains("\"databendTable\" : \"tgt.t\""))
    assert(day.contains("\"batchSize\" : 20000"), "template fields survive the merge")
    val Right(week) = ConfGen.generate(template, "db1", "t1", "tgt.t", "week", now)
    assert(week.contains("t1 >= '2024-03-08 10:30:00'"))
    val Right(month) = ConfGen.generate(template, "db1", "t1", "tgt.t", "month", now)
    assert(month.contains("t1 >= '2024-02-15 10:30:00'"), "calendar month, not 30 days")
  }

  test("generated config loads; the reference's AND-case quirk is preserved") {
    val Right(json) = ConfGen.generate(template, "db1", "t1", "tgt.t", "day", now)
    // Faithful reference bug (conf_generate.go:87 vs config.go:128): the
    // generator emits uppercase ' AND ' but the time-split shape gate only
    // accepts lowercase ' and ', so a generated time-split config is
    // rejected at load — identical observable behavior to the reference
    // (its main runs preCheckConfig on the parsed conf), pinned here.
    assert(ArchiverConfig.fromJson(json).isLeft)
    val cfg = ArchiverConfig.fromJson(json.replace(" AND ", " and "))
      .fold(e => fail(s"lowercased conf must load: $e"), identity)
    assert(cfg.sourceDB == "db1" && cfg.sourceSplitTimeKey == "t1")
    assert(cfg.sourceWhereCondition ==
      "t1 >= '2024-03-14 10:30:00' and t1 < '2024-03-15 10:30:00'")
  }

  test("invalid unit and bad template are rejected") {
    assert(ConfGen.generate(template, "d", "t", "x", "year", now).isLeft)
    assert(ConfGen.generate("not json", "d", "t", "x", "day", now).isLeft)
  }
}
