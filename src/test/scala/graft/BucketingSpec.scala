package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/** Bucketed co-located join: both sides pre-hashed into the same bucket
  * count on the join key means the join runs with ZERO shuffle exchanges
  * — the 100 TB strategy for repeated fact-dim joins (pay the
  * partitioning once at write, never at read). Asserted at the physical
  * plan level, not just by results.
  */
class BucketingSpec extends SparkSpec {

  private def collectShuffles(plan: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
    plan.collect {
      case s: ShuffleExchangeExec => Seq(s)
      case a: AdaptiveSparkPlanExec => collectShuffles(a.executedPlan)
    }.flatten

  test("bucketed tables join without any shuffle exchange") {
    // External tables with explicit paths (warehouse dir is a static
    // conf; unneeded when every table carries its own location).
    val wh = s"target/tmp/warehouse_${System.nanoTime()}"
    val orders = TableIO.table(spark, Sf0001, "orders")
    val customer = TableIO.table(spark, Sf0001, "customer")

    TableIO.writeBucketed(orders, "orders_b", s"$wh/orders_b", 8, Seq("o_custkey"))
    TableIO.writeBucketed(customer, "customer_b", s"$wh/customer_b", 8, Seq("c_custkey"))

    // Force a non-broadcast join so the shuffle-elision is what's tested.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))

      val expected = TableIO.table(spark, Sf0001, "orders")
        .join(TableIO.table(spark, Sf0001, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
        .orderBy("c_mktsegment").collect()

      assert(joined.orderBy("c_mktsegment").collect().map(_.toSeq).toSeq ==
        expected.map(_.toSeq).toSeq)

      // The join itself must not reshuffle either bucketed side. (The
      // groupBy on a different key legitimately shuffles — count only
      // exchanges whose output partitioning is on the join key.)
      val joinOnly = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      joinOnly.collect()
      val shuffles = collectShuffles(joinOnly.queryExecution.executedPlan)
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found: ${shuffles.map(_.nodeName)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
