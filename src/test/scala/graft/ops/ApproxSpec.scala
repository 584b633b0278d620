package graft.ops

import graft.SparkSpec

/** Error-envelope checks for the approximate aggregates that have no SQL
  * oracle (sketches are engine-specific). */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 15% of exact; percentiles ordered") {
    val r = graft.SparkEntry.queries("f_approx_agg")(spark, sf).head()
    val exact = r.getAs[Long]("exact_orders").toDouble
    val approx = r.getAs[Long]("approx_orders").toDouble
    assert(math.abs(approx - exact) / exact < 0.15,
      s"approx=$approx exact=$exact")
    val p50 = r.getAs[Double]("p50_price")
    val p95 = r.getAs[Double]("p95_price")
    assert(p50 > 0 && p95 >= p50)
  }
}
