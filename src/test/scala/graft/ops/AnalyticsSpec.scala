package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row

/** Semantic invariants for the analytics/profiling operators — properties
  * the DuckDB hash-compare cannot state (it checks equality with the
  * oracle, not that both engines satisfy the math). These run on sf0.001.
  */
class AnalyticsSpec extends SparkSpec {

  private def rows(name: String): Seq[Row] =
    SparkEntry.queries(name)(spark, sf).collect().toSeq

  test("events_funnel: stage populations are monotone non-increasing") {
    val byStage = rows("events_funnel")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage("1_view") >= byStage("2_click"))
    assert(byStage("2_click") >= byStage("3_purchase"))
    assert(byStage("3_purchase") > 0, "fixture must exercise the full funnel")
  }

  test("retention_cohort: offset-0 cell equals each cohort's size") {
    val rs = rows("retention_cohort")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val users = graft.ops.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    // every user is active in their own first week, so the offset-0 cells
    // partition the user population exactly
    assert(rs.filter(_._2 == 0L).map(_._3).sum == users)
    // no cell can exceed its cohort's offset-0 population
    val c0 = rs.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    rs.foreach { case (c, _, n) => assert(n <= c0(c)) }
  }

  test("graph_pagerank: ranks positive, bounded by total mass") {
    val rs = rows("graph_pagerank").map(r => r.getDouble(1))
    assert(rs.nonEmpty && rs.forall(_ > 0))
    // top-20 is a subset, so its mass is strictly below the full unit mass
    // (dangling nodes leak mass, so even the full sum is ≤ 1)
    assert(rs.sum < 1.0)
    // descending order with the node tiebreak
    assert(rs == rs.sorted(Ordering[Double].reverse))
  }

  test("cdc_upsert_merge: action counts reconcile with the surviving row count") {
    val r = rows("cdc_upsert_merge").head
    val (nRows, kept, updated, deleted, inserted) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nRows == kept + updated + inserted)
    assert(deleted > 0 && updated > 0 && inserted > 0,
      "fixture must exercise every merge action")
  }

  test("profile_columns: distinct and null counts are internally consistent") {
    val total = graft.ops.Tables.lineitem(spark, sf).count()
    rows("profile_columns").foreach { r =>
      val (nNull, nDistinct) = (r.getLong(1), r.getLong(2))
      assert(nNull >= 0 && nNull <= total)
      assert(nDistinct >= 1 && nDistinct <= total - nNull)
    }
  }

  test("f_histogram: CDF is monotone and ends at the table row count") {
    val rs = rows("f_histogram").map(r => (r.getLong(1), r.getLong(2)))
    val total = graft.ops.Tables.lineitem(spark, sf).count()
    assert(rs.map(_._1).sum == total)
    assert(rs.last._2 == total)
    assert(rs.map(_._2) == rs.map(_._1).scanLeft(0L)(_ + _).tail)
  }

  test("profile_cms_heavyhitters: CMS ε bound holds on the fixture (fixed seed)") {
    // the ε contract (est ≤ true + ε·N) only holds with confidence
    // δ=0.99, so the ORACLE gates just the guaranteed est ≥ true
    // invariant; here, with seed 42 and this fixture, the estimate is
    // deterministic and the bound is a stable property worth pinning
    import org.apache.spark.sql.functions._
    val words = Tables.fan(spark, Tables.documents(spark, sf))
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .as("word"))
    val bytes = words
      .select(expr("count_min_sketch(word, CAST(0.001 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val totalN = words.count()
    val slack = math.ceil(0.001 * totalN).toLong
    val top = rows("profile_cms_heavyhitters")
    assert(top.nonEmpty)
    top.foreach { r =>
      val (word, n) = (r.getString(0), r.getLong(1))
      val est = cms.estimateCount(word)
      assert(est >= n, s"CMS undercounted $word: $est < $n")
      assert(est <= n + slack,
        s"CMS ε bound violated for $word: $est > $n + $slack")
    }
  }

  test("anomaly_mad: outliers are a strict minority under the 3-MAD screen") {
    rows("anomaly_mad").foreach { r =>
      val (n, outliers) = (r.getLong(1), r.getLong(4))
      assert(outliers >= 0 && outliers * 4 < n,
        s"3-MAD should flag a small tail, got $outliers of $n")
    }
  }
}
