package graft.ops

import graft.SparkSpec
import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Edge-case pins for the reusable temporal-join operators (the oracle
  * checks them on real data; these pin the boundary semantics on crafted
  * rows where every edge is visible).
  */
class TemporalJoinsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: ties at equal ts count as at-or-before; no prior row gives null") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),  // exact-tie with click 102
      (2L, 10L, ts("2024-01-01 00:00:02")),  // between clicks 100,101? none ≤ → 100
      (3L, 20L, ts("2024-01-01 00:00:01")),  // user with no clicks → null
      (4L, 10L, ts("2024-01-01 00:00:01"))   // before any click → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:02")),
      (101L, 10L, ts("2024-01-01 00:00:05")), // tie pair: 101 vs 102 same ts
      (102L, 10L, ts("2024-01-01 00:00:05"))
    ).toDF("click_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("click_id").as("event_id"),
              col("click_id"))
    val out = TemporalJoins.asof(left, right, Seq("user_id"), "ts",
        Seq("click_id"), tiebreak = "event_id")
      .select("event_id", "asof_click_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(1L) === Some(102L), "tie at equal ts: click counts, max id wins")
    assert(out(2L) === Some(100L), "click at exactly left ts counts (>= semantics)")
    assert(out(3L) === None, "key with no right rows")
    assert(out(4L) === None, "left row before all right rows")
  }

  test("asof equals the brute-force definition on randomized data") {
    import spark.implicits._
    // seeded random corpus: many keys, duplicated timestamps, keys present
    // on only one side — the shapes the crafted-row test can't enumerate
    val rnd = new scala.util.Random(42)
    def randTs() = new Timestamp(1704067200000L + rnd.nextInt(500) * 1000L)
    val left = (1L to 400L).map(i =>
      (i, rnd.nextInt(12).toLong, randTs())).toSeq
    val right = (1000L to 1300L).map(i =>
      (i, rnd.nextInt(15).toLong, randTs())).toSeq
    val lDf = left.toDF("event_id", "user_id", "ts")
    val rDf = right.toDF("click_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("click_id").as("event_id"),
              col("click_id"))
    val got = TemporalJoins.asof(lDf, rDf, Seq("user_id"), "ts",
        Seq("click_id"), tiebreak = "event_id")
      .select("event_id", "asof_click_id").as[(Long, Option[Long])]
      .collect().toMap

    // brute force: latest right (ts, id)-max with same key and ts <= left ts
    val byKey = right.groupBy(_._2)
    left.foreach { case (eid, uid, lts) =>
      val expected = byKey.getOrElse(uid, Seq.empty)
        .filter(_._3.getTime <= lts.getTime)
        .sortBy(r => (r._3.getTime, r._1))
        .lastOption.map(_._1)
      assert(got(eid) === expected,
        s"event $eid user $uid ts $lts: got ${got(eid)}, expected $expected")
    }
  }

  test("rangeForward equals the brute-force definition on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def randTs() = new Timestamp(1704067200000L + rnd.nextInt(300) * 500L)
    val left = (1L to 200L).map(i => (i, randTs())).toSeq
    val right = (1000L to 1250L).map(i => (i, randTs())).toSeq
    val widthUs = 30L * 1000000L
    val got = TemporalJoins.rangeForward(
        left.toDF("lid", "lts"), right.toDF("rid", "rts"),
        "lts", "rts", widthUs)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val expected = (for {
      (lid, lts) <- left
      (rid, rts) <- right
      if rts.getTime >= lts.getTime && rts.getTime < lts.getTime + widthUs / 1000
    } yield (lid, rid)).toSet
    assert(got === expected,
      s"symmetric diff: ${(got diff expected) ++ (expected diff got)}")
  }

  test("rangeForward: closed-open [ts, ts+width) across bucket boundaries") {
    import spark.implicits._
    // width 10s; left at :07 probes buckets 0,1; matches :07 (inclusive),
    // :16 (next bucket), excludes :17 (== ts+width) and :06 (before)
    val left = Seq((1L, ts("2024-01-01 00:00:07"))).toDF("lid", "lts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:06")),
      (11L, ts("2024-01-01 00:00:07")),
      (12L, ts("2024-01-01 00:00:16")),
      (13L, ts("2024-01-01 00:00:17"))
    ).toDF("rid", "rts")
    val got = TemporalJoins.rangeForward(left, right, "lts", "rts", 10L * 1000000L)
      .select("rid").as[Long].collect().sorted.toSeq
    assert(got === Seq(11L, 12L))
  }

  test("q34_resample_interpolate: grid aligned, values bounded by neighbors") {
    import org.apache.spark.sql.functions._
    val step = 21600000000L
    val out = graft.SparkEntry.queries("q34_resample_interpolate")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("g_us") % step == 0, "grid points are epoch-aligned 6h multiples")
    }
    // interpolation stays within [min, max] of each user's raw values
    val bounds = graft.ops.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getAs[Long]("user_id"))
      val v = r.getAs[Double]("v_interp")
      assert(v >= lo - 1e-9 && v <= hi + 1e-9,
        s"interpolated $v outside the user's observed value range [$lo, $hi]")
    }
    // grid density: one point per 6h inside each user's span
    val spans = graft.ops.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
      .groupBy(col("user_id")).agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val (mn, mx) = spans(u)
      val expected = (mx - (mn + step - 1) / step * step) / step + 1
      assert(rs.length == expected.max(0),
        s"user $u: ${rs.length} grid points, expected $expected")
    }
  }

  test("q33_recursive_cte: depth histogram partitions orders; depth-1 row counts customers") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("q33_recursive_cte")(spark, sf).collect()
    // the walk covers the sampled customers (custkey % 10 = 0), capped at
    // 8 chain positions — the histogram partitions exactly those orders
    val orders = graft.ops.Tables.orders(spark, sf)
      .where(col("o_custkey") % 10 === 0)
    val perCust = orders.groupBy(col("o_custkey")).count()
      .select(least(col("count"), lit(8L)).as("c"))
      .agg(sum(col("c"))).head().getLong(0)
    assert(out.map(_.getAs[Long]("n")).sum == perCust,
      "every sampled order appears at exactly one depth ≤ 8 of its chain")
    assert(out.head.getAs[Int]("depth") == 1)
    assert(out.head.getAs[Long]("n") ==
      orders.select(countDistinct(col("o_custkey"))).head().getLong(0),
      "depth 1 = one row per sampled customer (their first order)")
    // depth histogram is non-increasing: a chain of depth d has all depths < d
    val ns = out.sortBy(_.getAs[Int]("depth")).map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      "deeper chain positions can never outnumber shallower ones")
  }
}
