package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable temporal join operators (library API — the query-suite entries
  * in `graft.ops.TemporalJoinOps` are thin wrappers over these).
  *
  * Both avoid the two shapes that fail at scale: per-row correlated
  * subqueries and inequality-only joins (BroadcastNestedLoopJoin).
  */
object TemporalJoins {

  /** As-of join: for every left row, the latest right row with the same
    * keys and `rightTs <= leftTs`, appended as `valueCols` (null when no
    * prior right row exists).
    *
    * Plan shape: union of tagged sides → ONE shuffle on `keys` → in-
    * partition sort by (ts, side, tiebreak) → `last(_, ignoreNulls)` over
    * an unbounded-preceding frame. O(n log n) per key partition; skew is
    * bounded by rows-per-key, not by the value distribution of ts.
    *
    * Ties: right rows sort before left rows at equal ts (a right row at
    * exactly the left instant counts as "at or before"); among right rows
    * with equal ts the greatest `tiebreak` wins.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val outValue = valueCols.map(c => s"asof_$c")
    val l = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) ++ Seq(col("__side"), col(tiebreak).as("__tb")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c"))): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((leftCols.map(c =>
          (if (right.columns.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType)).as(c)) ++
        Seq(col("__side"), col(tiebreak).as("__tb")) ++
        valueCols.map(c => col(c).as(s"__v_$c"))): _*)
    val win = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.zip(outValue).foldLeft(l.unionByName(r)) { case (df, (c, out)) =>
        df.withColumn(out, last(col(s"__v_$c"), ignoreNulls = true).over(win))
      }
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++ outValue.map(col)): _*)
  }

  /** Bounded-range join: pairs (l, r) with `r.ts ∈ [l.ts, l.ts + width)`,
    * `width` in microseconds. Implemented as an equi-join on range-width
    * buckets — each left row probes its 2 covering buckets — followed by
    * the exact range filter, so the plan is a shuffle-partitionable hash
    * join whose candidate work is ∝ rows per 2 buckets, never |L|×|R|.
    * `extraCond` is applied with the range filter (e.g. self-pair
    * exclusion).
    */
  def rangeForward(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      widthUs: Long,
      extraCond: Column = lit(true)): DataFrame = {
    val probes = left
      .withColumn("__b0", expr(s"unix_micros($leftTs) div $widthUs"))
      .withColumn("__bucket", explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val build = right
      .withColumn("__bucket", expr(s"unix_micros($rightTs) div $widthUs"))
    probes.join(build, Seq("__bucket"))
      .where(col(rightTs) >= col(leftTs) &&
             unix_micros(col(rightTs)) < unix_micros(col(leftTs)) + widthUs &&
             extraCond)
      .drop("__bucket")
  }
}
