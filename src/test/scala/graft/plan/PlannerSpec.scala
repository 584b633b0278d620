package graft.plan

import org.scalatest.funsuite.AnyFunSuite

/** Pins the planners to the reference's own unit-test expectations
  * (source/source_test.go:14-189, config/config_test.go:8-104) plus
  * tiling properties the reference never states but relies on
  * (seeded-random property loops; scalatestplus bridge unavailable offline). */
class PlannerSpec extends AnyFunSuite {
  import SplitPlanner._

  // ---- SlimCondition (source_test.go:14-57) ------------------------------
  test("slimRanges: 5 threads over [0,100], last upper = 100") {
    val r = slimRanges(5, 0, 100)
    assert(r.length == 5)
    assert(r.last._2 == BigInt(100))
    assert(r.head == (BigInt(0), BigInt(20)))
  }
  test("slimRanges: min > max → empty") {
    assert(slimRanges(5, 200, 100).isEmpty)
    assert(slimRanges(1, 200, 100).isEmpty)
  }
  test("slimRanges: one thread covers whole range; min==max collapses") {
    assert(slimRanges(1, 0, 100) == Seq((BigInt(0), BigInt(100))))
    assert(slimRanges(1, 100, 100) == Seq((BigInt(100), BigInt(100))))
  }

  // ---- SplitCondition (eager, stride batch) ------------------------------
  test("splitCondition: batch 10 over [0,100] → 10 open + final closed") {
    val c = splitCondition("id", 10, 0, 100)
    assert(c.length == 11)
    assert(c.head == "(id >= 0 and id < 10)")
    assert(c.last == "(id >= 100 and id <= 100)")
  }

  // ---- channel variant (source_test.go:59-103) ---------------------------
  test("splitConditionLazy: (10, 0, 100, 100) yields 12 conditions") {
    assert(splitConditionLazy("id", 10, 0, 100, 100).size == 12)
  }
  test("splitConditionLazy: (10, 0, 50, 100), 5th condition and count") {
    val c = splitConditionLazy("id", 10, 0, 50, 100).toSeq
    assert(c.length == 6)
    assert(c(4) == "(id >= 36 and id < 45)")
  }
  test("splitConditionLazy: (10, 0, 100, 100), 10th condition is [81,90)") {
    val c = splitConditionLazy("id", 10, 0, 100, 100).toSeq
    assert(c(9) == "(id >= 81 and id < 90)")
    assert(c.last == "(id >= 99 and id <= 100)")
  }
  test("splitConditionLazy: min > max → empty") {
    assert(splitConditionLazy("id", 10, 200, 100, 300).isEmpty)
  }

  // ---- time windows (source_test.go:105-137) -----------------------------
  test("timeWindows: hour unit (2h) 02:00→20:00 → 10 windows, final closed") {
    val c = timeWindows("t1", "hour", "2024-06-30 2:00:00", "2024-06-30 20:00:00").get
    assert(c.length == 10)
    assert(c.head == "(t1 >= '2024-06-30 02:00:00' and t1 < '2024-06-30 04:00:00')")
    assert(c.last == "(t1 >= '2024-06-30 20:00:00' and t1 <= '2024-06-30 20:00:00')")
  }
  test("timeWindows: min == max → 1 closed window") {
    val c = timeWindows("t1", "hour", "2024-06-30 2:00:00", "2024-06-30 2:00:00").get
    assert(c == Seq("(t1 >= '2024-06-30 02:00:00' and t1 <= '2024-06-30 02:00:00')"))
  }
  test("timeWindows: min > max → empty") {
    assert(timeWindows("t1", "hour", "2024-06-30 20:00:00", "2024-06-30 2:00:00").get.isEmpty)
  }
  test("timeWindows: overshoot emits degenerate trailing closed window") {
    val c = timeWindows("t1", "hour", "2024-06-30 02:00:00", "2024-06-30 03:00:00").get
    assert(c == Seq(
      "(t1 >= '2024-06-30 02:00:00' and t1 < '2024-06-30 04:00:00')",
      "(t1 >= '2024-06-30 04:00:00' and t1 <= '2024-06-30 03:00:00')"))
  }
  test("unit widths are the deliberate multiples") {
    assert(unitWidth("minute").get.toMinutes == 10)
    assert(unitWidth("quarter").get.toMinutes == 15)
    assert(unitWidth("hour").get.toHours == 2)
    assert(unitWidth("day").get.toHours == 24)
    assert(unitWidth("week").isEmpty)
  }

  // ---- chunking (source_test.go:139-174) ---------------------------------
  test("chunkConditions matches reference groupings") {
    assert(chunkConditions(Seq("a", "b", "c", "d", "e"), 2) ==
      Seq(Seq("a", "b", "c"), Seq("d", "e")))
    assert(chunkConditions(Seq("a", "b", "c", "d", "e", "f"), 2) ==
      Seq(Seq("a", "b", "c"), Seq("d", "e", "f")))
    assert(chunkConditions(Seq("a", "b", "c", "d"), 5) ==
      Seq(Seq("a", "b", "c", "d")))
  }

  // ---- lenient time parse -------------------------------------------------
  test("parseTimeDynamic accepts the 4 layouts incl. non-padded fields") {
    assert(parseTimeDynamic("2024-06-30 2:00:00").isSuccess)
    assert(parseTimeDynamic("2024-06-30 02:00:00").isSuccess)
    assert(parseTimeDynamic("2024-06-30T02:00:00.123").isSuccess)
    assert(parseTimeDynamic("2024-06-30T02:00:00").isSuccess)
    assert(parseTimeDynamic("2024-06-30T02:00:00.000+08:00").isSuccess)
    assert(parseTimeDynamic("not a time").isFailure)
  }

  // ---- density heuristic (mysql.go:43-65) --------------------------------
  test("adjustBatchSize: small table → whole range; density ≥10 → ×5; else unchanged") {
    assert(adjustBatchSize(1, 100, 50, 1000) == BigInt(100))      // fits a batch
    assert(adjustBatchSize(0, 99999, 1000, 100) == BigInt(500))   // density 100 → still ×5 (dead ×20 branch)
    assert(adjustBatchSize(0, 10000, 1000, 100) == BigInt(500))   // density 10 → ×5
    assert(adjustBatchSize(0, 5000, 1000, 100) == BigInt(100))    // density 5 → unchanged
  }

  test("useThreadSlicing mirrors worker plan choice") {
    assert(useThreadSlicing(0, 100000, 100, 10))
    assert(!useThreadSlicing(0, 1000, 100, 10))
  }

  // ---- unsigned 64-bit edge (SURVEY §7.4: NullUint64 has no JVM
  // primitive; BigInt carries the top half of the uint64 range) ------------
  test("planners handle keys above Long.MaxValue up to uint64 max") {
    val uMax = BigInt("18446744073709551615") // 2^64 - 1
    val lo = uMax - 25
    val conds = splitCondition("id", 10, lo, uMax)
    assert(conds.head == s"(id >= $lo and id < ${lo + 10})")
    // 3 open ranges cover [lo, lo+30); the trailing closed range is
    // degenerate (start > max) — reference loop shape, preserved
    assert(conds == Seq(
      s"(id >= $lo and id < ${lo + 10})",
      s"(id >= ${lo + 10} and id < ${lo + 20})",
      s"(id >= ${lo + 20} and id < ${lo + 30})",
      s"(id >= ${lo + 30} and id <= $uMax)"))
    val slices = slimRanges(4, lo, uMax)
    assert(slices.length == 4 && slices.last._2 == uMax)
    val lazyConds = splitConditionLazy("id", 10, lo, uMax, uMax).toSeq
    assert(lazyConds.last.endsWith(s"<= $uMax)"))
    assert(adjustBatchSize(lo, uMax, 2, 1000) == BigInt(26)) // whole tiny range
  }

  // ---- properties: tiling correctness ------------------------------------
  private case class Range(lo: BigInt, hi: BigInt, closedHi: Boolean) {
    def contains(k: BigInt): Boolean =
      k >= lo && (if (closedHi) k <= hi else k < hi)
  }
  private val rangeRe =
    """\(id >= (\d+) and id (<=?) (\d+)\)""".r
  private def parseRanges(cs: Seq[String]): Seq[Range] = cs.map {
    case rangeRe(lo, op, hi) => Range(BigInt(lo), BigInt(hi), op == "<=")
  }

  test("property: keySplitPredicates covers every key exactly once") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val min = BigInt(rnd.nextInt(1000))
      val max = min + rnd.nextInt(5000)
      val batch = BigInt(2 + rnd.nextInt(199))
      val threads = 1 + rnd.nextInt(16)
      val ranges = parseRanges(keySplitPredicates("id", batch, min, max, threads))
      val keys = (Seq(min, max) ++ (0 to 50).map(i => min + (max - min) * i / 50)).distinct
      keys.foreach { k =>
        val hits = ranges.count(_.contains(k))
        assert(hits == 1, s"key $k covered $hits times (min=$min max=$max batch=$batch threads=$threads)")
      }
    }
  }

  test("property: lazy variant tiles its slice (shared endpoints, no overlap)") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val batch = 2 + rnd.nextInt(49)
      val min = rnd.nextInt(500)
      val max = min + rnd.nextInt(500)
      val ranges = parseRanges(
        splitConditionLazy("id", BigInt(batch), BigInt(min), BigInt(max), BigInt(max)).toSeq)
      (min to max).foreach { k =>
        assert(ranges.count(_.contains(BigInt(k))) == 1,
          s"key $k (batch=$batch min=$min max=$max)")
      }
    }
  }

  test("property: time windows tile [min,max] without gap or overlap") {
    val base = java.time.LocalDateTime.of(2024, 6, 30, 0, 0, 0)
    val rnd = new scala.util.Random(11)
    val units = Seq("minute", "quarter", "hour", "day")
    (1 to 100).foreach { _ =>
      val spanSec = rnd.nextInt(100000)
      val unit = units(rnd.nextInt(units.length))
      val minT = base
      val maxT = base.plusSeconds(spanSec.toLong)
      val bounds = timeWindowBounds(unit,
        minT.format(TimeFormat), maxT.format(TimeFormat)).get
      // every probe instant in [min,max] falls in exactly one window
      (0 to 20).map(i => minT.plusSeconds(spanSec.toLong * i / 20)).distinct.foreach { t =>
        val hits = bounds.count { case (s, e, closed) =>
          !t.isBefore(s) && (if (closed) !t.isAfter(e) else t.isBefore(e))
        }
        assert(hits == 1, s"instant $t in $hits windows (unit=$unit span=$spanSec)")
      }
    }
  }
}
