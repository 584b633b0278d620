package graft.ops

import graft.SparkSpec
import graft.SparkEntry

/** Quality gates for the hash-based dedup ops that have no SQL oracle:
  * MinHash-LSH candidates must track exact n-gram Jaccard, SimHash must
  * find the planted near-duplicates, signatures must be deterministic. */
class DedupSpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-lsh recall: finds ≥80% of exact-jaccard≥0.5 pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = pairs("dedup_minhash_lsh")
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (exact=${exact.size}, lsh=${lsh.size})")
  }

  test("minhash-lsh precision: high-confidence candidates are real near-dups") {
    val confident = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .where("est_jac >= 0.7")
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("dedup_ngram_jaccard") // true jaccard ≥ 0.5
    if (confident.nonEmpty) {
      val hit = confident.count(exact.contains).toDouble / confident.size
      assert(hit >= 0.7, s"precision $hit over ${confident.size} confident pairs")
    }
  }

  test("simhash finds near-dup pairs and is deterministic across runs") {
    val a = SparkEntry.queries("dedup_simhash")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("dedup_simhash")(spark, sf).collect().toSeq
    assert(a == b, "simhash signatures must be deterministic")
    assert(a.nonEmpty, "planted near-dups should collide in some 16-bit chunk")
  }

  test("simhash near-dup pairs overlap exact near-dup pairs") {
    val sim = pairs("dedup_simhash")
    val exact = pairs("dedup_ngram_jaccard")
    assert((sim intersect exact).nonEmpty,
      s"no overlap between simhash (${sim.size}) and exact (${exact.size}) pairs")
  }
}
