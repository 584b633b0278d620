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

    // Time-series resampling with linear interpolation: each user's
    // irregular event values sampled onto a 6-hour grid (grid points are
    // epoch-aligned multiples inside the user's observed span), value at
    // each grid point interpolated between the nearest points at-or-before
    // and at-or-after. The Spark plan is the scalable shape: generate the
    // grid with sequence+explode (no driver loop), then TWO as-of passes
    // through the same union+window operator (backward for (t0,v0);
    // forward = backward over negated time) — each is one shuffle on
    // user_id, never a per-grid-point subquery or an inequality join.
    // Duplicate timestamps collapse via max_by(value, event_id) first, so
    // both neighbors are uniquely defined. The interpolation expression
    // has the same shape in both engines → bit-identical doubles.
    Q("q34_resample_interpolate",
      """WITH pts AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
        |         arg_max(value, event_id) AS v
        |  FROM events GROUP BY user_id, epoch_us(CAST(ts AS TIMESTAMP))),
        |b AS (SELECT user_id, min(t) AS mn, max(t) AS mx FROM pts GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(range((mn + 21599999999) // 21600000000 * 21600000000,
        |                               mx + 1, 21600000000)) AS g
        |  FROM b),
        |lo AS (SELECT g.user_id, g.g, max(p.t) AS t0
        |       FROM grid g JOIN pts p ON p.user_id = g.user_id AND p.t <= g.g
        |       GROUP BY g.user_id, g.g),
        |hi AS (SELECT g.user_id, g.g, min(p.t) AS t1
        |       FROM grid g JOIN pts p ON p.user_id = g.user_id AND p.t >= g.g
        |       GROUP BY g.user_id, g.g),
        |j AS (SELECT l.user_id, l.g, l.t0, h.t1, p0.v AS v0, p1.v AS v1
        |      FROM lo l JOIN hi h ON l.user_id = h.user_id AND l.g = h.g
        |      JOIN pts p0 ON p0.user_id = l.user_id AND p0.t = l.t0
        |      JOIN pts p1 ON p1.user_id = l.user_id AND p1.t = h.t1)
        |SELECT user_id, g AS g_us,
        |  CASE WHEN t1 = t0 THEN v0
        |       ELSE v0 + (v1 - v0) * ((g - t0) / (t1 - t0)) END AS v_interp
        |FROM j ORDER BY user_id, g_us""".stripMargin) { (s, d) =>
      import graft.operators.TemporalJoins.asof
      // NOTE: grid alignment uses integer `div`, which truncates toward
      // zero, while the oracle's `//` floors — identical for the
      // post-1970 (non-negative µs) domain the events fixtures and the
      // archival sources guarantee; pre-epoch timestamps would need
      // floorDiv on both sides.
      val step = 21600000000L
      val pts = events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
                col("value"), col("event_id"))
        .groupBy(col("user_id"), col("t"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
      val grid = pts.groupBy(col("user_id"))
        .agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
        .withColumn("start", expr(s"(mn + ${step - 1}) div $step * $step"))
        .where(col("start") <= col("mx"))
        .select(col("user_id"),
          explode(sequence(col("start"), col("mx"), lit(step))).as("t"))
      val back = asof(grid,
        pts.select(col("user_id"), col("t"), col("t").as("t0"), col("v").as("v0")),
        keys = Seq("user_id"), tsCol = "t",
        valueCols = Seq("t0", "v0"), tiebreak = "t")
      val fwd = asof(
        back.withColumn("g", col("t")).withColumn("t", -col("t")),
        pts.select(col("user_id"), (-col("t")).as("t"),
                   col("t").as("t1"), col("v").as("v1")),
        keys = Seq("user_id"), tsCol = "t",
        valueCols = Seq("t1", "v1"), tiebreak = "t")
      fwd.select(col("user_id"), col("g").as("g_us"),
          when(col("asof_t1") === col("asof_t0"), col("asof_v0"))
            .otherwise(col("asof_v0") + (col("asof_v1") - col("asof_v0")) *
              ((col("g") - col("asof_t0")) / (col("asof_t1") - col("asof_t0"))))
            .as("v_interp"))
        .orderBy(col("user_id"), col("g_us"))
    },

    // SCD Type-2 temporal dimension join — each fact row joined to the
    // dimension VERSION effective at its event time (the warehouse pattern
    // for slowly-changing attributes). Dimension versions are synthesized
    // deterministically (base segment at T0; an upgrade at T0+10d for
    // custkey%3=0, another at T0+20d for custkey%5=0), the join is the
    // SAME reusable as-of operator — one key shuffle, no inequality join —
    // and because the version schedule is regular, the oracle states the
    // effective attribute in CLOSED FORM per event (the mm_av_alignment
    // pattern: operator must equal the arithmetic ideal).
    Q("scd2_dim_join",
      """WITH f AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, value
        |  FROM events WHERE user_id >= 1),
        |c AS (SELECT c_custkey, c_mktsegment FROM customer),
        |eff AS (
        |  SELECT f.user_id, f.value,
        |    CASE WHEN f.user_id % 5 = 0 AND f.t >= epoch_us(TIMESTAMP '2024-01-21 00:00:00')
        |         THEN 'UPGRADED2'
        |         WHEN f.user_id % 3 = 0 AND f.t >= epoch_us(TIMESTAMP '2024-01-11 00:00:00')
        |         THEN 'UPGRADED1'
        |         ELSE c.c_mktsegment END AS seg
        |  FROM f JOIN c ON f.user_id = c.c_custkey)
        |SELECT seg, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM eff GROUP BY seg ORDER BY seg""".stripMargin) { (s, d) =>
      // FIXTURE PRECONDITION (shared with the oracle's closed form): every
      // event time is >= t0, so the base version always applies and the
      // as-of side never yields NULL — the isNotNull filter below is the
      // same inner-join the oracle's JOIN performs. An event before t0
      // would be dropped here but keep the base segment in the oracle;
      // events start 2024-01-01 00:00:07 at every SF.
      val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
      val day = 86400000000L
      val facts = events(s, d).where(col("user_id") >= 1)
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
                col("value"), col("event_id").as("tb"))
      val dim = customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val versions = dim
        .select(col("user_id"), lit(t0).as("t"),
                col("c_mktsegment").as("seg"), lit(0L).as("tb"))
        .unionAll(dim.where(col("user_id") % 3 === 0)
          .select(col("user_id"), lit(t0 + 10 * day),
                  lit("UPGRADED1"), lit(1L)))
        .unionAll(dim.where(col("user_id") % 5 === 0)
          .select(col("user_id"), lit(t0 + 20 * day),
                  lit("UPGRADED2"), lit(2L)))
      graft.operators.TemporalJoins
        .asof(facts, versions, keys = Seq("user_id"), tsCol = "t",
              valueCols = Seq("seg"), tiebreak = "tb")
        .where(col("asof_seg").isNotNull)
        .groupBy(col("asof_seg").as("seg"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
        .orderBy(col("seg"))
    },

    // NEAREST as-of — completes the family (backward = asof_join_events,
    // forward+backward = q34's interpolation): each purchase matched to
    // its temporally closest click either direction, ties to the earlier
    // (backward) side. Composed from TWO passes of the same as-of
    // operator (forward = backward over negated time), then a purchase-
    // grained pick — still no inequality join anywhere; the oracle is the
    // per-user all-pairs argmin, which the operator must equal. Purchases
    // with no click at all keep a NULL match (left semantics).
    Q("asof_nearest_events",
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_t
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id AS c_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_t
        |  FROM events WHERE event_type = 'click'),
        |cand AS (
        |  SELECT p.p_id, c.c_id, c.c_t - p.p_t AS delta,
        |    row_number() OVER (PARTITION BY p.p_id
        |      ORDER BY abs(c.c_t - p.p_t),
        |               CASE WHEN c.c_t <= p.p_t THEN 0 ELSE 1 END, c.c_id) AS rn
        |  FROM p JOIN c ON p.user_id = c.user_id)
        |SELECT p.p_id, p.user_id, p.p_t,
        |  n.c_id AS near_c_id, CAST(n.delta AS BIGINT) AS delta_us
        |FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) n ON p.p_id = n.p_id
        |ORDER BY p.p_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
                col("event_id").as("p_id"), col("event_id").as("tb"))
      // NEGATED tiebreak: asof keeps the greatest tiebreak among equal-ts
      // right rows, the oracle's rn prefers the SMALLEST c_id — negating
      // aligns them even if a source quantizes timestamps into collisions
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
                col("event_id").as("c_id"), unix_micros(col("ts")).as("c_t"),
                (-col("event_id")).as("tb"))
      val back = graft.operators.TemporalJoins
        .asof(p, c, keys = Seq("user_id"), tsCol = "t",
              valueCols = Seq("c_id", "c_t"), tiebreak = "tb")
        .select(col("p_id"), col("user_id"), col("t").as("p_t"),
                col("asof_c_id").as("b_id"), col("asof_c_t").as("b_t"))
      val fwd = graft.operators.TemporalJoins
        .asof(p.withColumn("t", -col("t")), c.withColumn("t", -col("t")),
              keys = Seq("user_id"), tsCol = "t",
              valueCols = Seq("c_id", "c_t"), tiebreak = "tb")
        .select(col("p_id"), col("asof_c_id").as("f_id"),
                col("asof_c_t").as("f_t"))
      back.join(fwd, "p_id")
        .select(col("p_id"), col("user_id"), col("p_t"),
          expr("""CASE
                 |  WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                 |  WHEN f_id IS NULL THEN b_id
                 |  WHEN b_id IS NULL THEN f_id
                 |  WHEN abs(b_t - p_t) <= abs(f_t - p_t) THEN b_id
                 |  ELSE f_id END""".stripMargin).as("near_c_id"),
          expr("""CAST(CASE
                 |  WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                 |  WHEN f_id IS NULL THEN b_t - p_t
                 |  WHEN b_id IS NULL THEN f_t - p_t
                 |  WHEN abs(b_t - p_t) <= abs(f_t - p_t) THEN b_t - p_t
                 |  ELSE f_t - p_t END AS BIGINT)""".stripMargin).as("delta_us"))
        .orderBy(col("p_id"))
    },

    // Last-touch attribution — the marketing/conversion analytic composed
    // on the SAME as-of kernel as asof_join_events: each purchase is
    // attributed to the user's most recent click, but only when that
    // click falls inside a 7-day lookback window (the latest click being
    // stale implies every earlier one is staler — the window test needs
    // only the as-of result, never a second scan). Per-user rollup with
    // a decimal-exact attributed-revenue sum and a bit_xor pin of
    // exactly WHICH click ids won. Scale: identical to the as-of join —
    // one user_id shuffle, O(n log n) per user partition; the rollup
    // reuses the same key.
    Q("events_attribution",
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 1 AS is_p, value,
        |         CAST(NULL AS BIGINT) AS click_id, CAST(NULL AS TIMESTAMP) AS click_ts
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP), event_id, 0, CAST(NULL AS DOUBLE),
        |         event_id, CAST(ts AS TIMESTAMP)
        |  FROM events WHERE event_type = 'click'),
        |w AS (
        |  SELECT user_id, event_id, is_p, value, epoch_us(ts) AS t,
        |    last_value(click_id IGNORE NULLS) OVER win AS c_id,
        |    epoch_us(last_value(click_ts IGNORE NULLS) OVER win) AS c_t
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_p, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |a AS (
        |  SELECT user_id, value,
        |    CASE WHEN c_id IS NOT NULL AND t - c_t <= 604800000000
        |         THEN c_id END AS attrib
        |  FROM w WHERE is_p = 1)
        |SELECT user_id, count(*) AS n_purchases,
        |  CAST(count(attrib) AS BIGINT) AS n_attributed,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (attrib IS NOT NULL)
        |       AS DOUBLE) AS attributed_value,
        |  CAST(bit_xor(coalesce(attrib, 0)) AS BIGINT) AS attrib_click_xor
        |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_id").as("click_id"), col("ts").as("click_ts"))
      graft.operators.TemporalJoins
        .asof(purchases, clicks, keys = Seq("user_id"), tsCol = "ts",
              valueCols = Seq("click_id", "click_ts"), tiebreak = "event_id")
        .withColumn("attrib",
          when(col("asof_click_id").isNotNull &&
            unix_micros(col("ts")) - unix_micros(col("asof_click_ts"))
              <= 604800000000L, col("asof_click_id")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("attrib")).as("n_attributed"),
          sum(when(col("attrib").isNotNull, col("value").cast("decimal(18,2)")))
            .cast("double").as("attributed_value"),
          expr("bit_xor(coalesce(attrib, 0L))").as("attrib_click_xor"))
        .orderBy(col("user_id"))
    },
  )
}
