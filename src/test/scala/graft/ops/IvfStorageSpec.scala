package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proof of the SCALE.md claim that the IVF cell id is the natural storage
  * partition key: write the corpus partitioned by cell, and a probe-list
  * query prunes to the probed cells' directories at planning time — at
  * 100 TB that is the difference between scanning the corpus and scanning
  * nprobe/ncells of it.
  */
class IvfStorageSpec extends SparkSpec {

  test("cell-partitioned corpus prunes unprobed cells at the scan") {
    import graft.functions.VectorOps.dot_d
    val dir = Files.createTempDirectory("graft-ivf-store").toString
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val cents = e.where(col("vec_id") >= 5 && col("vec_id") < 21)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: org.apache.spark.sql.Column, w: Array[Double]) =
      dot_d(a, typedLit(w)) / (sqrt(dot_d(a, a)) * sqrt(lit(w.map(x => x * x).sum)))
    val scores = array(cents.map { case (cid, w) =>
      struct(cos(col("v"), w).as("c"), lit(cid).as("cid")) }: _*)
    e.withColumn("cell", array_max(scores).getField("cid"))
      .write.partitionBy("cell").mode("overwrite").parquet(dir)

    val probed = Seq(cents(0)._1, cents(3)._1)
    val q = spark.read.parquet(dir).where(col("cell").isin(probed: _*))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      "cell filter must prune partitions at the scan:\n" + plan)
    // pruning is real: only the probed cells' files are read
    val readParts = q.queryExecution.executedPlan.collectLeaves()
      .head.asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      .selectedPartitions.partitionCount
    assert(readParts == probed.length,
      s"expected ${probed.length} partition dirs, scanned $readParts")
  }
}
