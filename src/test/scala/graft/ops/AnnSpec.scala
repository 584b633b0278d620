package graft.ops

import graft.SparkSpec
import graft.SparkEntry

/** Recall gate for the LSH ANN path against the brute-force baseline. */
class AnnSpec extends SparkSpec {

  private def topk(name: String): Map[Long, Seq[Long]] =
    SparkEntry.queries(name)(spark, sf)
      .select("query_id", "neighbor_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

  test("lsh ann: deterministic and returns ranked neighbors per query") {
    val a = topk("ann_lsh_topk")
    val b = topk("ann_lsh_topk")
    assert(a == b, "LSH signatures/buckets must be deterministic")
    assert(a.nonEmpty && a.values.forall(_.nonEmpty))
  }

  test("lsh ann: candidates rank correctly vs brute force where they overlap") {
    val exact = topk("ann_bruteforce_topk")
    val lsh = topk("ann_lsh_topk")
    // every LSH-returned neighbor's exact rank order must be consistent:
    // the intersection must appear in the same relative order as brute force
    lsh.foreach { case (q, neighbors) =>
      val exactOrder = exact.getOrElse(q, Seq.empty)
      val common = neighbors.filter(exactOrder.contains)
      val expected = exactOrder.filter(common.contains)
      assert(common == expected,
        s"query $q: LSH order $common inconsistent with exact $expected")
    }
  }

  test("lsh ann: recall@10 vs brute force is nontrivial (bucketing not degenerate)") {
    val exact = topk("ann_bruteforce_topk")
    val lsh = topk("ann_lsh_topk")
    val recalls = exact.map { case (q, ex) =>
      val got = lsh.getOrElse(q, Seq.empty).toSet
      ex.count(got.contains).toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // random 64-dim noise + 16-bit LSH: modest recall expected, but the
    // buckets must beat the ~6% a single random 4-bit band would give
    assert(mean >= 0.1, s"mean recall@10 $mean")
  }
}
