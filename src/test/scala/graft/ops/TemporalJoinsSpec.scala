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
}
