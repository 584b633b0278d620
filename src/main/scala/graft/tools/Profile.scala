package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time isolated stages of the heaviest bench queries to find
  * where the seconds actually go before optimizing. Not part of the
  * driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.create()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val schema = raw.schema

    time("uncached scan+count (1 partition)")(raw.count())
    time("uncached scan all cols (1 part)")(
      raw.groupBy("l_returnflag").count().count())
    time("uncached fan+count") {
      graft.ops.Tables.fan(spark, raw).groupBy("l_returnflag").count().count()
    }
    time("uncached fan+to_json") {
      val li = graft.ops.Tables.fan(spark, raw)
      li.select(to_json(struct(li.columns.map(col): _*)).as("line"))
        .select(count(length(col("line")))).collect()(0).getLong(0)
    }
    time("full f1 body uncached") {
      val li = graft.ops.Tables.fan(spark, raw)
      li.select(to_json(struct(li.columns.map(col): _*)).as("line"))
        .select(from_json(col("line"), schema).as("r"))
        .select(col("r.*"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")).count()
    }
    time("full f1 body uncached, 2nd run") {
      val li = graft.ops.Tables.fan(spark, raw)
      li.select(to_json(struct(li.columns.map(col): _*)).as("line"))
        .select(from_json(col("line"), schema).as("r"))
        .select(col("r.*"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")).count()
    }
    for (q <- Seq("ann_bruteforce_topk", "ann_lsh_topk", "dedup_minhash_lsh",
                  "dedup_simhash", "q5_join_agg_topk")) {
      time(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
    }
    time("f1 after heavy queries") {
      graft.SparkEntry.queries("f1_ndjson_roundtrip")(spark, sfDir).count()
    }
    time("f1 again") {
      graft.SparkEntry.queries("f1_ndjson_roundtrip")(spark, sfDir).count()
    }
    spark.stop()
  }
}
