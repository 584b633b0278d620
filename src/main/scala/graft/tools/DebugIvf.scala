package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.VectorOps.dot_d

/** Scratch A/B probe for the knn_graph_ivf scale branch (round-10 trainer
  * wiring): per-stage timings + recall at a bigger query sample on the
  * uniform 100k tier. Not part of the suite.
  */
object DebugIvf {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.create()
    val dir = "/tmp/ivfdbg"
    val vecRows = 100000L
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      spark.range(vecRows)
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
    // semantic check: collect_top_k(_, 3) must return the 3 LARGEST,
    // descending
    val chk = spark.range(10)
      .select(lit(1).as("g"),
        struct((col("id") * 7 % 10).cast("double").as("a"), col("id").as("b")).as("s"))
      .groupBy(col("g"))
      .agg(graft.functions.TopK.collect_top_k(col("s"), 3).as("t"))
      .select(expr("transform(t, x -> x.a)")).head.getSeq[Double](0)
    println(s"DBG topk3-desc = ${chk.mkString(",")} (expect 9.0,8.0,7.0)")
    time("train(317)") {
      graft.ops.AnnOps.scaleTrainedCentroids(spark, dir, 317)
    }
    def runGraph(): Unit =
      graft.SparkEntry.queries("knn_graph_ivf")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    time("graph noop (normalized)")(runGraph())
    // stage isolation: how much of the graph is the candidate join alone?
    locally {
      import graft.functions.VectorOps.dot_d
      import graft.functions.TopK.collect_top_k
      val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
      val en2 = e0
        .withColumn("nrm", sqrt(dot_d(col("v"), col("v"))))
        .select(col("vec_id"),
          expr("transform(v, x -> x / greatest(nrm, 1e-30d))").as("v"))
      val cents = spark.createDataFrame(
          graft.ops.AnnOps.scaleTrainedCentroids(spark, dir, 317)
            .map { case (cid, cv) => (cid, cv.toSeq) }.toIndexedSeq)
        .toDF("cid", "cv")
      val top = en2.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          struct(dot_d(col("v"), col("cv")).as("cs"), col("cid").as("cid")).as("sc"))
        .groupBy(col("vec_id"))
        .agg(collect_top_k(col("sc"), 9).as("cells"))
      time("stage: top cells agg")(top.write.format("noop").mode("overwrite").save())
      val assigned = top
        .select(col("vec_id"), col("cells")(0).getField("cid").as("cell"))
        .join(en2, Seq("vec_id"))
      val probes = top
        .select(col("vec_id").as("query_id"), explode(col("cells")).as("c"))
        .select(col("query_id"), col("c.cid").as("cell"))
        .join(en2.select(col("vec_id").as("query_id"), col("v").as("qv")),
          Seq("query_id"))
      val cand = assigned.join(probes, Seq("cell"))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"),
          struct(dot_d(col("qv"), col("v")).as("cos"),
            col("vec_id").as("neighbor_id")).as("cand"))
      time("stage: candidates count")(println("DBG n_cand = " + cand.count()))
      val fin = cand.groupBy(col("query_id"))
        .agg(collect_top_k(col("cand"), 3).as("top"))
      time("stage: full with final agg")(fin.write.format("noop").mode("overwrite").save())
      // A: hash aggregation without the 128-key sort fallback
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "20000000")
      time("stage: final agg hash-path")(fin.write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
      // B: packed-long top-k (28-bit quantized cos | 34-bit id)
      val packed = assigned.join(probes, Seq("cell"))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"),
          (least(greatest(floor((dot_d(col("qv"), col("v")) + lit(1.0d)) *
              lit((1L << 27).toDouble)), lit(0.0d)), lit(((1L << 28) - 1).toDouble))
            .cast("long") * lit(1L << 34) + col("vec_id")).as("pk"))
        .groupBy(col("query_id"))
        .agg(collect_top_k(col("pk"), 3).as("top"))
      time("stage: final agg packed-long")(packed.write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "20000000")
      time("stage: packed-long + hash")(packed.write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    }
    // brute-force truth at 500 queries, normalized + native dot
    val en = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", sqrt(dot_d(col("v"), col("v"))))
      .select(col("vec_id"),
        expr("transform(v, x -> x / greatest(nrm, 1e-30d))").as("v"))
    val queries = en.where(pmod(col("vec_id"), lit(200)) === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    val truth = time("bruteforce truth(500q)") {
      queries.crossJoin(en)
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          dot_d(col("qv"), col("v")).as("cos"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
        .localCheckpoint(true)
    }
    time("recall(trained)") {
      val gg = graft.SparkEntry.queries("knn_graph_ivf")(spark, dir)
        .select(col("query_id"), col("neighbor_id"))
      val hit = truth.join(gg, Seq("query_id", "neighbor_id")).count()
      val total = truth.count()
      println(f"DBG recall@3 trained = ${hit.toDouble / total}%.4f ($hit/$total)")
    }
    spark.stop()
  }
}
