package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probes for the knn_graph_ivf scale work (round 10). Current
  * experiment: where does the two-level index's time go — analytic cell
  * population stats (no pair materialization) + per-cell work skew.
  * Not part of the suite.
  */
object DebugIvf {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.create()
    val n = 1000000L
    val dir = "/tmp/ivfdbg_1m"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      spark.range(n)
        .select(
          col("id").as("vec_id"),
          expr("""transform(sequence(0, 63),
              j -> cast((cast(pmod(xxhash64(id, j + 100), 2000001) AS DOUBLE)
                         / 1000000.0 - 1.0) AS FLOAT))""").as("embedding"),
          expr("cast(pmod(xxhash64(id, 99), 16) AS INT)").as("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DBG $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val en = graft.ops.AnnOps.normalizedVecs(e0)
    val (assigned, probes) = time("build index (train)") {
      graft.ops.AnnOps.twoLevelAssignProbes(spark, en, n, 32, 32, 2, 4)
    }
    val na = assigned.groupBy(col("cell")).agg(count(lit(1)).as("na"))
      .localCheckpoint(true)
    val np = probes.groupBy(col("cell")).agg(count(lit(1)).as("np"))
      .localCheckpoint(true)
    time("cell stats") {
      val j = na.join(np, Seq("cell"))
        .select(col("cell"), col("na"), col("np"),
          (col("na") * col("np")).as("work"))
      val r = j.agg(count(lit(1)), max(col("na")), max(col("np")),
        sum(col("work")), max(col("work"))).head()
      println(s"DBG cells=${r.getLong(0)} maxNa=${r.getLong(1)} " +
        s"maxNp=${r.getLong(2)} totalWork=${r.getLong(3)} maxCellWork=${r.getLong(4)}")
      val top = j.orderBy(col("work").desc).limit(5).collect()
      top.foreach(t => println(s"DBG hotcell ${t.getLong(0)} na=${t.getLong(1)} np=${t.getLong(2)} work=${t.getLong(3)}"))
    }
    time("graph noop") {
      graft.ops.AnnOps.topKEdges(assigned, probes, en, 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
