package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-layer business aggregations (reference: src/data/gold.py:27-60).
  *
  * Both are hash aggregations over tiny key domains (dates / 24 hours):
  * Catalyst plans partial (map-side) + final `HashAggregateExec`, so the
  * shuffle moves one row per key per task — at 100 TB the reduce side is
  * still only |dates|x|columns|. No custom operator needed.
  */
object GoldAggregations {

  /** Daily fraud summary (reference: gold.py:31-41). */
  def dailyFraudSummary(silver: DataFrame): DataFrame =
    silver
      .groupBy("ingestion_date")
      .agg(
        count(col("transaction_id")).as("total_transactions"),
        sum(col("label")).as("fraud_cases"),
        round(avg(col("amount")), 2).as("avg_transaction_amount"),
        sum(col("amount")).as("total_volume"))
      .withColumn("fraud_rate", round(col("fraud_cases") / col("total_transactions"), 4))
      .orderBy("ingestion_date")

  /** Hourly pattern summary (reference: gold.py:45-52). */
  def hourlyPatterns(silver: DataFrame): DataFrame =
    silver
      .groupBy("txn_hour")
      .agg(
        count(col("transaction_id")).as("total_transactions"),
        sum(col("label")).as("fraud_cases"),
        round(avg(col("spending_deviation_score")), 4).as("avg_spending_deviation"))
      .orderBy("txn_hour")
}
