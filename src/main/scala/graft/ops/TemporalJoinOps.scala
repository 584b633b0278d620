package graft.ops

import org.apache.spark.sql.functions._

/** Temporal joins over the events stream — pipeline extensions beyond the
  * reference (which has no joins at all, SURVEY.md §2.3): the two join
  * shapes a training-data/event pipeline always needs and Spark has no
  * built-in operator for. Both queries are thin wrappers over the reusable
  * library operators in `graft.operators.TemporalJoins`.
  *
  * - `asof_join_events` — for every purchase, the most recent click by the
  *   same user at-or-before the purchase. NOT implemented as a per-row
  *   correlated subquery or an inequality join (both explode at scale):
  *   union both sides with a tag, one shuffle on `user_id`, sort within
  *   partition by time, and carry the latest click forward with
  *   `last(..., ignoreNulls)` over an unbounded-preceding frame. Work is
  *   O(n log n) per user partition, one shuffle total — the sort-merge
  *   as-of pattern that survives 100 TB (skew bounded by events-per-user).
  *
  * - `range_join_events` — count the events in the hour after each
  *   purchase: a pure range (non-equi) join. Naively this is a
  *   BroadcastNestedLoopJoin — O(purchases × events). Instead both sides
  *   are bucketed to the range width (1 h), each probe explodes to its 2
  *   covering buckets, and the join becomes an equi-join on the bucket key
  *   with an exact range filter after — candidate work ∝ events per 2
  *   buckets, shuffle-partitionable on the bucket key at any scale.
  */
object TemporalJoinOps {
  import Tables._

  val all: Seq[Q] = Seq(

    Q("asof_join_events",
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 1 AS is_p,
        |         CAST(NULL AS BIGINT) AS click_id, CAST(NULL AS TIMESTAMP) AS click_ts
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP), event_id, 0,
        |         event_id, CAST(ts AS TIMESTAMP)
        |  FROM events WHERE event_type = 'click'),
        |w AS (
        |  SELECT event_id, user_id, is_p, epoch_us(ts) AS ts_us,
        |    last_value(click_id IGNORE NULLS) OVER win AS last_click_id,
        |    epoch_us(last_value(click_ts IGNORE NULLS) OVER win) AS last_click_us
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_p, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ts_us, last_click_id, last_click_us
        |FROM w WHERE is_p = 1 ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_id").as("click_id"), col("ts").as("click_ts"))
      graft.operators.TemporalJoins
        .asof(purchases, clicks, keys = Seq("user_id"), tsCol = "ts",
              valueCols = Seq("click_id", "click_ts"), tiebreak = "event_id")
        .select(col("event_id"), col("user_id"),
                unix_micros(col("ts")).as("ts_us"),
                col("asof_click_id").as("last_click_id"),
                unix_micros(col("asof_click_ts")).as("last_click_us"))
        .orderBy(col("event_id"))
    },

    Q("range_join_events",
      """SELECT p.event_id AS purchase_id, count(*) AS n_following
        |FROM events p JOIN events e
        |  ON CAST(e.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
        | AND CAST(e.ts AS TIMESTAMP) < CAST(p.ts AS TIMESTAMP) + INTERVAL 1 HOUR
        | AND e.event_id <> p.event_id
        |WHERE p.event_type = 'purchase'
        |GROUP BY purchase_id ORDER BY purchase_id""".stripMargin) { (s, d) =>
      val purchases = events(s, d).where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      graft.operators.TemporalJoins
        .rangeForward(purchases, events(s, d).select(col("event_id"), col("ts")),
          leftTs = "p_ts", rightTs = "ts", widthUs = 3600L * 1000000L,
          extraCond = col("event_id") =!= col("purchase_id"))
        .groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_following"))
        .orderBy(col("purchase_id"))
    },
  )
}
