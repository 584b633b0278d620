package graft.ops

import graft.SparkSpec

/** Error-envelope checks for the approximate aggregates. The contract
  * query itself now emits bound booleans the DuckDB oracle pins to true;
  * this spec re-asserts them locally (and at the raw level for one
  * sketch) so a regression fails here before the gate. */
class ApproxSpec extends SparkSpec {

  test("sketch bounds hold: HLL within 15%, quantiles ordered and inside IQR") {
    val r = graft.SparkEntry.queries("f_approx_agg")(spark, sf).head()
    assert(r.getAs[Long]("exact_orders") > 0)
    assert(r.getAs[Long]("exact_parts") > 0)
    assert(r.getAs[Boolean]("orders_within_15pct"))
    assert(r.getAs[Boolean]("parts_within_15pct"))
    assert(r.getAs[Boolean]("p50_within_iqr"))
    assert(r.getAs[Boolean]("p95_above_p50"))
  }

  test("raw HLL estimate tracks exact count on a bigger column too") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val exact = r.getAs[Long]("exact").toDouble
    val approx = r.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.15, s"approx=$approx exact=$exact")
  }
}
