package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.VectorOps.dot_d

/** Scratch A/B probes for the knn_graph_ivf scale branch (round 10).
  * Current experiment: does more Lloyd training buy recall on a
  * CLUSTERED corpus at fixed probe budget, and how do the centroid sets
  * compare on cell balance? Not part of the suite.
  */
object DebugIvf {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.create()
    val n = 100000L
    val dir = "/tmp/ivfdbg_clustered"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      spark.range(n)
        .withColumn("blob", expr(
          "CASE WHEN pmod(xxhash64(id, 5), 10) < 3 THEN 0 " +
          "ELSE 1 + cast(pmod(xxhash64(id, 6), 15) AS INT) END"))
        .select(
          col("id").as("vec_id"),
          expr("""transform(sequence(0, 63), j -> cast(
              (cast(pmod(xxhash64(blob, j + 200), 2001) AS DOUBLE) / 1000.0 - 1.0)
              + (CASE WHEN blob = 0 THEN 0.05 ELSE 0.25 END) *
                ((cast(pmod(xxhash64(id, j * 3 + 300), 1001) AS DOUBLE)
                + cast(pmod(xxhash64(id, j * 3 + 301), 1001) AS DOUBLE)
                + cast(pmod(xxhash64(id, j * 3 + 302), 1001) AS DOUBLE)) / 1000.0 - 1.5)
            AS FLOAT))""").as("embedding"),
          col("blob").cast("int").as("label"))
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
    val en = graft.ops.AnnOps.normalizedVecs(e0).localCheckpoint(true)
    // brute truth at 500 queries
    val queries = en.where(pmod(col("vec_id"), lit(200)) === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    val truth = queries.crossJoin(en)
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dot_d(col("qv"), col("v")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .localCheckpoint(true)
    def recallOf(g: org.apache.spark.sql.DataFrame): Double = {
      val hit = truth.join(g.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count()
      hit.toDouble / truth.count()
    }
    def stats(cents: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val sizes = en.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"), dot_d(col("v"), col("cv")).as("cs"))
        .groupBy(col("vec_id")).agg(max(struct(col("cs"), col("cid"))).as("b"))
        .select(col("b.cid").as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("nc"))
      val r = sizes.agg(max(col("nc")), sum(col("nc") * col("nc"))).head()
      (r.getLong(0), r.getLong(1).toDouble / (n.toDouble / 317.0 * n.toDouble))
    }
    def centsDfOf(c: Array[(Long, Array[Double])]) =
      graft.ops.AnnOps.normalizedCents(spark.createDataFrame(
        c.map { case (cid, cv) => (cid, cv.toSeq) }.toIndexedSeq)
        .toDF("cid", "cv"))
    // seeded baseline
    val seeded = graft.ops.AnnOps.normalizedCents(
      e0.where(col("vec_id") >= 5 && col("vec_id") < lit(5L + 317))
        .select(col("vec_id").as("cid"), col("v").as("cv")))
    val (mxS, imbS) = stats(seeded)
    val rS = time("recall seeded")(
      recallOf(graft.ops.AnnOps.knnGraphScale(en, seeded, 9, 3)))
    println(f"DBG seeded     recall=$rS%.4f maxcell=$mxS imbalance=$imbS%.2f")
    // budget-matched comparison: trained cells carry ~1.85× less
    // candidate mass than seeded (imbalance 1.34 vs 2.48), so raise
    // nprobe until the budgets match and compare recall at equal cost
    val c2 = graft.ops.AnnOps.trainKmeansOn(spark, e0, n, 317, 2,
      l2Metric = false)
    val cd2 = centsDfOf(c2)
    for (nprobe <- Seq(9, 13, 17, 22)) {
      val r = time(s"recall trained np=$nprobe")(
        recallOf(graft.ops.AnnOps.knnGraphScale(en, cd2, nprobe, 3)))
      println(f"DBG trained np=$nprobe%-3d recall=$r%.4f")
    }
    spark.stop()
  }
}
