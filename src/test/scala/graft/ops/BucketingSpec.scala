package graft.ops



import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables — the scale path for repeated fact⋈
  * fact joins: pay the shuffle once at write time (CLUSTER BY into bucketed
  * files), then every subsequent join on the bucket key plans with ZERO
  * exchanges. At 100 TB this is the difference between re-shuffling the
  * fact table per query and never shuffling it again.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // warehouse.dir is static; managed tables land in ./spark-warehouse
    // (gitignored) and are dropped in finally
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    try {
      // AQE off for a deterministic plan assertion; bucketing benefits are
      // identical with it on.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"), first("o_totalprice").as("tp"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle either side:\n" + plan)
      // and the result matches the unbucketed join
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
