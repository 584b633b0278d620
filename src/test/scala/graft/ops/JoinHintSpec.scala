package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join-strategy hints — the manual override surface a tuner reaches for
  * when statistics mislead the planner at scale. Each hint must actually
  * force its physical operator (a silently-ignored hint is how a 100 TB
  * join quietly falls back to the wrong strategy).
  */
class JoinHintSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def orders   = Tables.orders(spark, sf)
  private def customer = Tables.customer(spark, sf)

  test("BROADCAST hint forces a broadcast hash join") {
    val p = plan(orders.join(customer.hint("broadcast"),
      col("o_custkey") === col("c_custkey")))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("MERGE hint forces a sort-merge join even for a broadcastable dim") {
    val p = plan(orders.join(customer.hint("merge"),
      col("o_custkey") === col("c_custkey")))
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("SHUFFLE_HASH hint forces a shuffled hash join") {
    val p = plan(orders.join(customer.hint("shuffle_hash"),
      col("o_custkey") === col("c_custkey")))
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("SQL-form hint matches the DataFrame-form hint") {
    orders.createOrReplaceTempView("jh_orders")
    customer.createOrReplaceTempView("jh_customer")
    val p = plan(spark.sql(
      """SELECT /*+ MERGE(jh_customer) */ *
        |FROM jh_orders JOIN jh_customer ON o_custkey = c_custkey""".stripMargin))
    assert(p.contains("SortMergeJoin"), p)
  }

  test("hinted joins agree with each other on results") {
    val base = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)), sum(col("o_orderkey")).cast("long")).collect().toSeq
    Seq("broadcast", "merge", "shuffle_hash").foreach { h =>
      val r = orders.join(customer.hint(h), col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)), sum(col("o_orderkey")).cast("long")).collect().toSeq
      assert(r == base, s"hint $h changed results")
    }
  }
}
