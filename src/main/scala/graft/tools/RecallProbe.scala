package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.SimHash64
import graft.ops.Tables

/** Diagnostic: simhash hamming distances of the exact-Jaccard near-dup
  * pairs at a scale factor — the data for tuning candidate-generation
  * (chunk width / multi-probe radius) against verified recall.
  *
  * Usage: runMain graft.tools.RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    val exact = graft.ops.DedupOps.exactJaccardPairs(spark, sfDir)
      .select(col("d1"), col("d2"))
    val sigs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        SimHash64.simhash64(expr("regexp_extract_all(lower(text), '\\\\S+', 0)")).as("sig"))
    val withH = exact
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("s1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("s2")), "d2")
      .select(col("d1"), col("d2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).as("hamming"))
      .orderBy(col("hamming").desc)
    withH.show(100, truncate = false)
    val n = withH.count()
    val over = withH.where(col("hamming") > 7).count()
    println(s"pairs=$n hamming>7=$over (multi-probe r=1 on 16-bit chunks guarantees <=7)")
    spark.stop()
  }
}
