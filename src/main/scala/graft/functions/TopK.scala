package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnShim

/** Bounded top-k as a PARTIAL-AGGREGATING function — the scale-correct
  * replacement for `row_number().over(Window.partitionBy(key)) <= k`
  * when only the top k rows per key survive: the window shape shuffles
  * and sorts EVERY candidate row (the knn-graph re-rank pushes
  * nprobe·N²/K ≈ 284M rows through that exchange at the 100k tier),
  * while `CollectTopK` (Spark's own bounded-priority-queue aggregate,
  * `catalyst.expressions.aggregate.CollectTopK`) keeps ≤k elements per
  * key per map partition, so the exchange carries ≤ k · keys · partitions
  * rows. Constructed through [[ColumnShim]] because Spark keeps the
  * expression `private[sql]`-adjacent (no public `collect_top_k` in the
  * Scala function surface at 4.1.2).
  */
object TopK {
  /** Top `k` values of `c` per group, returned as an array sorted
    * DESCENDING by the value's natural ordering (for a struct:
    * lexicographic over its fields). `reverse = true` flips to the k
    * smallest, ascending. */
  def collect_top_k(c: Column, k: Int, reverse: Boolean = false): Column =
    ColumnShim.collectTopK(c, k, reverse)
}
