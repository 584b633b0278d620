package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.operators.DedupClustering

/** Property check of the DISTRIBUTED star-contraction path against a
  * driver-side union-find reference on random graphs — the clustering
  * core under half the dedup family, forced off its small-graph driver
  * shortcut (threshold 0) so the alternating large-star/small-star
  * rounds are what's under test. Graph shapes are weighted toward the
  * adversarial ones: long CHAINS (A~B~C… without A~C — the shape
  * near-dup graphs actually take, and the diameter stress that kills
  * plain label propagation), plus stars and uniform random pairs.
  * Few trials (Spark jobs per trial), sized to stay O(seconds). */
class DedupClusteringPropertySpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private val genEdges: Gen[Seq[(Long, Long)]] = Gen.frequency(
    // long chain with an offset — worst-case diameter
    3 -> Gen.chooseNum(2, 120).map(n =>
      (0 until n - 1).map(i => (i.toLong * 7 + 3, (i + 1).toLong * 7 + 3))),
    // star — worst-case degree skew
    2 -> Gen.chooseNum(2, 120).map(n =>
      (1 until n).map(i => (500L, 500L + i))),
    // uniform random pairs over a small id space (dense overlap)
    4 -> Gen.chooseNum(1, 150).flatMap(m =>
      Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, 80L); b <- Gen.chooseNum(0L, 80L)
        if a != b
      } yield (math.min(a, b), math.max(a, b))).map(_.distinct)),
    // two chains bridged at one end — merge across contractions
    1 -> Gen.chooseNum(2, 60).map { n =>
      val c1 = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      val c2 = (0 until n - 1).map(i => (1000L + i, 1000L + i + 1))
      c1 ++ c2 :+ (n.toLong - 1, 1000L)
    })

  test("star-contraction components == union-find on adversarial random graphs") {
    import spark.implicits._
    val p = Prop.forAllNoShrink(genEdges) { edges =>
      if (edges.isEmpty) Prop(true)
      else {
        val df = edges.toDF("d1", "d2")
        val got = DedupClustering
          .connectedComponents(df, smallGraphThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = unionFind(edges)
        Prop(got == want) :|
          s"components diverged on ${edges.size} edges: " +
          s"got ${got.toSeq.sortBy(_._1).take(6)}… want ${want.toSeq.sortBy(_._1).take(6)}…"
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, s"star-contraction: ${res.status}")
  }
}
