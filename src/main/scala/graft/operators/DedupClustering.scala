package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph → (id, comp) with
  * comp = min doc id of the component (the canonical representative).
  *
  * Hybrid execution, like any production graph step:
  * - small graphs (≤ `smallGraphThreshold` directed edges after
  *   symmetrization) collect to the driver and run union-find — near-dup
  *   graphs are usually a tiny fraction of the corpus, and a driver pass
  *   beats N distributed rounds of scheduling overhead;
  * - large graphs run distributed min-label propagation: each round joins
  *   labels across edges, takes the min per vertex, and localCheckpoints
  *   (lineage truncation); rounds = component diameter. The label sum is
  *   strictly monotone decreasing, so an O(V) aggregate is the convergence
  *   test — no join-based change count. At pathological diameters the same
  *   loop structure upgrades to large-star/small-star contraction.
  */
object DedupClustering {

  /** @param pairs undirected dup pairs as columns (d1, d2), d1 < d2 */
  def connectedComponents(
      pairs: DataFrame,
      smallGraphThreshold: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // materialize the (possibly expensive) pair computation ONCE before the
    // symmetrizing union references it twice
    val p = pairs.select(col("d1").cast("long").as("d1"),
      col("d2").cast("long").as("d2")).localCheckpoint(true)
    val edges = p.select(col("d1").as("src"), col("d2").as("dst"))
      .union(p.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint(true)

    if (edges.count() <= smallGraphThreshold) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      // union by min root: the root is always the component's min id
      edges.as[(Long, Long)].collect().foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      parent.keys.toSeq.sorted.map(id => (id, find(id))).toDF("id", "comp")
    } else {
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id")).localCheckpoint(true)
      def labelSum(): Long = labels.agg(sum(col("comp"))).head().getLong(0)
      var prevSum = -1L
      var curSum = labelSum()
      while (curSum != prevSum) {
        val prop = edges.join(labels, edges("src") === labels("id"))
          .select(col("dst").as("id"), col("comp"))
        labels = labels.union(prop)
          .groupBy(col("id")).agg(min(col("comp")).as("comp"))
          .localCheckpoint(true)
        prevSum = curSum
        curSum = labelSum()
      }
      labels
    }
  }
}
