package graft

class EntrySmokeSpec extends SparkSpec {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns a readable result") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      withClue(s"query $name:") { assert(n >= 0) }
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without a query: $extra")
  }

  test("queries return non-empty results (operators are non-trivial)") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      if (fn(spark, sf).limit(1).count() == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results at sf0.001: $empty")
  }
}
