package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal joins over the events stream — pipeline extensions beyond the
  * reference (which has no joins at all, SURVEY.md §2.3): the two join
  * shapes a training-data/event pipeline always needs and Spark has no
  * built-in operator for.
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
      // Clicks sort before purchases at equal ts (is_p 0 < 1): a click at
      // exactly the purchase instant counts as "at or before"; ties among
      // clicks resolve to the highest event_id — same order in the oracle.
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_p"),
                lit(null).cast("long").as("click_id"),
                lit(null).cast("timestamp").as("click_ts"))
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_p"),
                col("event_id").as("click_id"), col("ts").as("click_ts"))
      val win = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_p"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.unionByName(c)
        .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(win))
        .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(win))
        .where(col("is_p") === 1)
        .select(col("event_id"), col("user_id"),
                unix_micros(col("ts")).as("ts_us"),
                col("last_click_id"),
                unix_micros(col("last_click_ts")).as("last_click_us"))
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
      val hourUs = 3600L * 1000000L
      val ev = events(s, d).select(col("event_id"), col("ts"))
      // Each purchase's 1h-forward window spans at most 2 hour-buckets:
      // probe buckets b0 and b0+1, equi-join on bucket, exact filter after.
      val probes = events(s, d).where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"),
                expr(s"unix_micros(ts) div $hourUs").as("b0"))
        .select(col("purchase_id"), col("p_ts"),
                explode(array(col("b0"), col("b0") + 1)).as("bucket"))
      val probed = ev.select(col("event_id"), col("ts"),
        expr(s"unix_micros(ts) div $hourUs").as("bucket"))
      probes.join(probed, Seq("bucket"))
        .where(col("ts") >= col("p_ts") &&
               col("ts") < col("p_ts") + expr("INTERVAL 1 HOUR") &&
               col("event_id") =!= col("purchase_id"))
        .groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_following"))
        .orderBy(col("purchase_id"))
    },
  )
}
