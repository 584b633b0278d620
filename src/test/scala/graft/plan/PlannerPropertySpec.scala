package graft.plan

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck tiling laws for the split generators (SURVEY §5's promised
  * property coverage; PlannerSpec pins the reference-exact examples,
  * these pin the INVARIANTS over the whole input space):
  *
  *  - every integer in [min, max] is matched by EXACTLY ONE emitted
  *    predicate — no gap, no overlap — for both the eager and the
  *    thread-sliced/lazy key plans, across the full uint64 domain
  *    (keys are BigInt precisely because Long cannot hold 2⁶⁴-1);
  *  - time windows tile [min, max] contiguously: half-open steps of
  *    exactly the unit width, one closed final window ending at max
  *    (degenerate when the last step overshoots — reference behavior);
  *  - chunkConditions is a partition of its input in order, ≤ maxThread
  *    chunks, balanced sizes.
  *
  * Raw ScalaCheck (no scalatest bridge in the offline cache): each law
  * runs through SCTest.check and the suite asserts `passed`.
  */
class PlannerPropertySpec extends AnyFunSuite {

  private val U64Max = (BigInt(1) << 64) - 1

  /** uint64 values with the edges over-weighted: uniform small, uniform
    * huge, and the exact top-of-range the reference's uint64 keys hit. */
  private val genKey: Gen[BigInt] = Gen.frequency(
    4 -> Gen.chooseNum(0L, 1000000L).map(BigInt(_)),
    3 -> Gen.chooseNum(Long.MinValue, Long.MaxValue)
      .map(v => BigInt(v) - Long.MinValue), // uniform in [0, 2⁶⁴)
    2 -> Gen.chooseNum(0L, 5000L).map(U64Max - _),
    1 -> Gen.const(U64Max))

  private def runProp(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  /** Parse an emitted predicate back to a half-open integer interval
    * [lo, hiEx); a closed upper bound becomes hiEx = hi + 1. Fails the
    * property on any string the grammar does not match. */
  private val PredPat =
    """\(k >= (\d+) and k (<=?) (\d+)\)""".r
  private def interval(pred: String): (BigInt, BigInt) = pred match {
    case PredPat(lo, op, hi) =>
      (BigInt(lo), if (op == "<=") BigInt(hi) + 1 else BigInt(hi))
    case other => sys.error(s"unparseable predicate: $other")
  }

  /** Exactly-once integer coverage of [min, max]: clamp each interval to
    * the key domain (the eager generator's last half-open stride may
    * overshoot max — `[k, k+batch)` with k+batch > max — which is
    * harmless because no key exists past the table max; the property
    * verifies the DOMAIN is covered exactly once, not the void beyond
    * it. NB the overshoot is also where the reference's Go uint64
    * arithmetic would WRAP and emit a match-nothing range at the very
    * top of the key space — BigInt rendering is the deliberate fix, and
    * the top-heavy genKey distribution exercises exactly that corner).
    * Then: drop empty intervals and the sorted remainder must chain
    * lo == cursor → hiEx with no jumps and end at max + 1. */
  private def coversExactlyOnce(preds: Seq[String], min: BigInt,
      max: BigInt): Prop = {
    val ivs = preds.map(interval)
      .map { case (lo, hiEx) => (lo, hiEx.min(max + 1)) }
      .filter { case (lo, hiEx) => lo < hiEx }
    val sorted = ivs.sortBy(_._1)
    var cursor = min
    var ok = true
    sorted.foreach { case (lo, hiEx) =>
      if (lo != cursor) ok = false
      cursor = hiEx
    }
    Prop(ok && cursor == max + 1) :| s"coverage chain broke (${sorted.take(4)}…, cursor=$cursor, want ${max + 1})"
  }

  /** (min, max, batch) with the span DERIVED as batch·n + jitter so the
    * emitted predicate count stays ~n (bounded) no matter how small the
    * batch draws — a free-span generator can demand a half-million-string
    * plan per trial and OOM the shared test JVM. */
  private def genRangePlan(minBatch: Long): Gen[(BigInt, BigInt, BigInt)] =
    for {
      a <- genKey
      batch <- Gen.chooseNum(minBatch, 100000L)
      n <- Gen.chooseNum(0L, 800L)
      jit <- Gen.chooseNum(0L, 100L)
    } yield {
      val span = BigInt(batch) * n + jit
      val min = a.min(U64Max - span)
      (min, min + span, BigInt(batch))
    }

  test("keySplitPredicates: exactly-once tiling of [min, max] over uint64") {
    val gen = for {
      (min, max, batch) <- genRangePlan(2L)
      threads <- Gen.chooseNum(1, 16)
    } yield (min, max, batch, threads)
    runProp("keySplitPredicates", Prop.forAllNoShrink(gen) {
      case (min, max, batch, threads) =>
        coversExactlyOnce(
          SplitPlanner.keySplitPredicates("k", batch, min, max, threads),
          min, max)
    })
  }

  test("splitCondition (eager): exactly-once tiling, final range closed") {
    runProp("splitCondition", Prop.forAllNoShrink(genRangePlan(1L)) {
      case (min, max, batch) =>
        val preds = SplitPlanner.splitCondition("k", batch, min, max)
        coversExactlyOnce(preds, min, max) &&
          (Prop(preds.last.contains("<=")) :| "final range must be closed") &&
          (Prop(preds.init.forall(p => p.contains(" < ") && !p.contains("<=")))
            :| "non-final ranges must be half-open")
    })
  }

  test("splitConditionLazy: shared-endpoint stride tiles each slice; global max closed") {
    runProp("splitConditionLazy", Prop.forAllNoShrink(genRangePlan(2L)) {
      case (min, max, batch) =>
        val preds = SplitPlanner.splitConditionLazy("k", batch, min, max, max).toSeq
        coversExactlyOnce(preds, min, max) &&
          (Prop(preds.count(_.contains("<=")) == 1) :| "exactly one closed range") &&
          (Prop(interval(preds.last)._2 == max + 1) :| "the closed range ends at allMax")
    })
  }

  test("slimRanges: maxThread contiguous slices, remainder absorbed by the last") {
    val gen = for {
      a <- genKey; span <- Gen.chooseNum(0L, 2000000L)
      threads <- Gen.chooseNum(1, 32)
    } yield (a.min(U64Max - span), a.min(U64Max - span) + span, threads)
    runProp("slimRanges", Prop.forAllNoShrink(gen) { case (min, max, threads) =>
      val slices = SplitPlanner.slimRanges(threads, min, max)
      Prop(slices.size == threads) :| "one slice per thread" &&
        Prop(slices.head._1 == min && slices.last._2 == max) :| "ends pinned" &&
        Prop(slices.sliding(2).forall {
          case Seq((_, hi), (lo2, _)) => lo2 == hi
          case _                      => true
        }) :| "adjacent slices share their endpoint"
    })
  }

  test("timeWindowBounds: contiguous unit-width half-open windows, closed final at max") {
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val gen = for {
      startOff <- Gen.chooseNum(0L, 400000L)
      span <- Gen.chooseNum(0L, 600000L) // seconds, up to ~7 days
      unit <- Gen.oneOf("minute", "quarter", "hour", "day")
    } yield (base.plusSeconds(startOff), base.plusSeconds(startOff + span), unit)
    val fmt = SplitPlanner.TimeFormat
    runProp("timeWindowBounds", Prop.forAllNoShrink(gen) { case (minT, maxT, unit) =>
      val width = SplitPlanner.unitWidth(unit).get
      val ws = SplitPlanner
        .timeWindowBounds(unit, minT.format(fmt), maxT.format(fmt)).get
      var cursor = minT
      var ok = ws.nonEmpty
      ws.zipWithIndex.foreach { case ((s, e, closed), i) =>
        val isLast = i == ws.size - 1
        if (s != cursor) ok = false
        if (isLast) { if (!closed || e != maxT) ok = false }
        else { if (closed || e != s.plus(width)) ok = false; cursor = e }
      }
      Prop(ok) :| s"window chain broke: ${ws.take(3)}…"
    })
  }

  test("timeWindows strings agree with timeWindowBounds (rendering law)") {
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val gen = for {
      startOff <- Gen.chooseNum(0L, 400000L)
      span <- Gen.chooseNum(0L, 600000L)
      unit <- Gen.oneOf("minute", "quarter", "hour", "day")
    } yield (base.plusSeconds(startOff), base.plusSeconds(startOff + span), unit)
    val fmt = SplitPlanner.TimeFormat
    runProp("timeWindows-rendering", Prop.forAllNoShrink(gen) { case (minT, maxT, unit) =>
      val strs = SplitPlanner
        .timeWindows("t", unit, minT.format(fmt), maxT.format(fmt)).get
      val bounds = SplitPlanner
        .timeWindowBounds(unit, minT.format(fmt), maxT.format(fmt)).get
      Prop(strs.size == bounds.size) :| "same window count" &&
        Prop(strs.zip(bounds).forall { case (str, (s, e, closed)) =>
          val op = if (closed) "<=" else "<"
          str == s"(t >= '${s.format(fmt)}' and t $op '${e.format(fmt)}')"
        }) :| "each string renders its bound triple"
    })
  }

  test("chunkConditions: ordered partition, ≤ maxThread chunks, balanced") {
    val gen = for {
      n <- Gen.chooseNum(0, 500)
      threads <- Gen.chooseNum(1, 32)
    } yield (Seq.tabulate(n)(identity), threads)
    runProp("chunkConditions", Prop.forAllNoShrink(gen) { case (xs, threads) =>
      val chunks = SplitPlanner.chunkConditions(xs, threads)
      Prop(chunks.flatten == xs) :| "concatenation preserves order and content" &&
        Prop(chunks.size <= math.max(threads, 1) ||
          (xs.isEmpty && chunks.size == 1)) :| "at most maxThread chunks" &&
        Prop(xs.isEmpty || threads >= xs.size || chunks.forall(
          _.size <= (xs.size + threads - 1) / threads)) :| "balanced chunk sizes"
    })
  }

  test("adjustBatchSize: monotone envelope of the density heuristic") {
    val gen = for {
      a <- genKey; span <- Gen.chooseNum(0L, 4000000L)
      rows <- Gen.chooseNum(1L, 2000000L)
      batch <- Gen.chooseNum(1L, 1000000L)
    } yield (a.min(U64Max - span), a.min(U64Max - span) + span,
      BigInt(rows), BigInt(batch))
    runProp("adjustBatchSize", Prop.forAllNoShrink(gen) { case (min, max, rows, batch) =>
      val adj = SplitPlanner.adjustBatchSize(min, max, rows, batch)
      val rangeSize = max - min + 1
      if (rows <= batch) Prop(adj == rangeSize) :| "table fits one batch → whole range"
      else if (rangeSize / rows >= 10) Prop(adj == batch * 5) :| "sparse keys → ×5"
      else Prop(adj == batch) :| "dense keys → unchanged"
    })
  }
}
