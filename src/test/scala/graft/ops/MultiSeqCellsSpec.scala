package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MultiSeqCells

/** Pins the multi-sequence frontier walk against the full-grid sort it
  * replaced, INCLUDING the production parameter point the old
  * explode-the-grid plan degenerated at (k1 = 64 at the N ≈ 16.7M
  * flip, p = 12 ⇒ m = 144 > k1: the grid formulation shipped the full
  * 64×64 rows per vector through an aggregate; the kernel visits O(m)
  * cells). Scores are drawn without exact ties, so the grid sort is a
  * total order and the comparison is exact set-and-order equality. */
class MultiSeqCellsSpec extends AnyFunSuite {

  private def cellsArray(entries: Seq[(Double, Long)]): ArrayData =
    new GenericArrayData(entries.sortBy { case (s, cid) => (-s, -cid) }
      .map { case (s, cid) => InternalRow(s, cid) }.toArray[Any])

  /** Brute-force: sort the full grid by (s1+s2 DESC, combined cid DESC). */
  private def gridTopM(c1: Seq[(Double, Long)], c2: Seq[(Double, Long)],
      k2: Int, m: Int): Seq[Long] =
    (for ((s1, i1) <- c1; (s2, i2) <- c2)
      yield (s1 + s2, i1 * k2 + i2))
      .sortBy { case (s, cid) => (-s, -cid) }.take(m).map(_._2)

  private def kernel(c1: Seq[(Double, Long)], c2: Seq[(Double, Long)],
      k2: Int, m: Int): Seq[Long] =
    MultiSeqCells.multiSeqKernel(cellsArray(c1), cellsArray(c2), k2, m)
      .toLongArray().toSeq

  test("frontier walk equals the full-grid sort on randomized scores") {
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val n1 = 1 + rnd.nextInt(12); val n2 = 1 + rnd.nextInt(12)
      val k2 = 16
      // distinct scores => total order; cids unique per subspace
      val c1 = rnd.shuffle((0 until n1).toList)
        .zipWithIndex.map { case (cid, i) => (i * 0.37 + rnd.nextDouble() * 0.1, cid.toLong) }
      val c2 = rnd.shuffle((0 until n2).toList)
        .zipWithIndex.map { case (cid, i) => (i * 0.53 + rnd.nextDouble() * 0.1, cid.toLong) }
      val m = 1 + rnd.nextInt(n1 * n2 + 4)
      assert(kernel(c1, c2, k2, m) == gridTopM(c1, c2, k2, m),
        s"n1=$n1 n2=$n2 m=$m")
    }
  }

  test("production parameter point: k1=64, p=12, m=144") {
    val rnd = new scala.util.Random(7)
    val k1 = 64; val m = 144
    // per-subspace keep = min(m, k1) = 64 entries, like the live plan
    val c1 = (0 until k1).map(cid => (rnd.nextGaussian(), cid.toLong))
    val c2 = (0 until k1).map(cid => (rnd.nextGaussian(), cid.toLong))
    val got = kernel(c1, c2, k1, m)
    assert(got == gridTopM(c1, c2, k1, m))
    assert(got.size == m && got.distinct.size == m)
  }

  test("degenerate inputs: empty, singleton, m past the grid") {
    assert(kernel(Seq.empty, Seq((1.0, 0L)), 4, 3).isEmpty)
    assert(kernel(Seq((1.0, 2L)), Seq((2.0, 3L)), 4, 5) == Seq(11L))
    val c = Seq((3.0, 0L), (1.0, 1L))
    // m=100 > 2x2 grid: all four cells, grid order
    assert(kernel(c, c, 2, 100) == gridTopM(c, c, 2, 100))
  }
}
