package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Stage-level cost attribution for dedup_minhash_lsh at the ScaleSmoke
  * tier: signatures alone, banded candidates, and the full verified query
  * are timed separately so the 100-TB bottleneck claim in SCALE.md rests
  * on a measurement, not an inference from the total.
  *
  * Usage: runMain graft.tools.MinhashProfile [docRows]
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val docRows = if (args.nonEmpty) args(0).toLong else 1300000L
    val spark = ToolSession.create()
    val dir = Files.createTempDirectory("graft-mh-prof").toString
    spark.range(docRows)
      .withColumn("seed", expr(
        "CASE WHEN pmod(xxhash64(id, 7), 100) < 2 THEN id - pmod(id, 50) ELSE id END"))
      .select(
        col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(
            sequence(0, 39 + cast(pmod(xxhash64(seed, 2), 40) AS INT)),
            i -> concat('w', pmod(xxhash64(seed, i + 10), 30000))))""")
          .as("text"),
        expr("element_at(array('en','de','fr','es'), " +
          "cast(pmod(xxhash64(seed, 3), 4) AS INT) + 1)").as("lang"),
        expr("element_at(array('web','news','wiki','code'), " +
          "cast(pmod(xxhash64(seed, 4), 4) AS INT) + 1)").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = graft.ops.Tables.fan(spark,
      spark.read.parquet(s"$dir/documents.parquet"))

    time("signatures") {
      docs.select(col("doc_id"),
        graft.functions.VectorOps.minhash_shingled(
          expr("regexp_extract_all(text, '\\\\S+', 0)"), 5, 64).as("sig"))
    }
    time("tokenize_only") {
      docs.select(col("doc_id"),
        expr("size(regexp_extract_all(text, '\\\\S+', 0))").as("n"))
    }
    time("candidates") {
      graft.ops.DedupOps.minhashCandidatesOf(docs)
    }
    time("full_query") {
      graft.SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
    }
    spark.stop()
  }
}
