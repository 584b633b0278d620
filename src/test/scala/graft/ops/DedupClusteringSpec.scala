package graft.ops

import graft.SparkSpec
import graft.operators.DedupClustering

/** Both execution paths of the clustering operator must agree — the
  * threshold is a performance knob, never a semantics knob. */
class DedupClusteringSpec extends SparkSpec {

  test("union-find and distributed label propagation produce identical components") {
    import spark.implicits._
    // chain 1-2-3, pair 10-11, triangle 20-21-22 (+cross edge), singleton-free
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("d1", "d2")
    val local = DedupClustering.connectedComponents(pairs, smallGraphThreshold = Long.MaxValue)
      .as[(Long, Long)].collect().toMap
    val dist = DedupClustering.connectedComponents(pairs, smallGraphThreshold = 0)
      .as[(Long, Long)].collect().toMap
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(local == expect)
    assert(dist == expect)
  }

  test("paths agree on the real jaccard pair graph (sf0.001)") {
    import spark.implicits._
    val pairs = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .select("d1", "d2")
    val local = DedupClustering.connectedComponents(pairs, Long.MaxValue)
      .as[(Long, Long)].collect().toMap
    val dist = DedupClustering.connectedComponents(pairs, 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
  }
}
