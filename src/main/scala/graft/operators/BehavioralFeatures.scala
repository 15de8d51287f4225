package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral time-range window features — the semantic core of the
  * reference (reference: src/features/build_features.py:26-39, SURVEY §2.5).
  *
  * All windows share one partition/order spec (`partitionBy(account)
  * .orderBy(ts_unix)`); only the range frame differs. Catalyst's
  * `CollapseWindow` + planner therefore evaluate every feature over a
  * **single** Exchange + Sort — one shuffle of the fact table, not three.
  * Do not "refactor" the specs apart: that is what keeps this the only
  * shuffle-heavy stage in the pipeline at 100 TB.
  *
  * Semantics preserved exactly (SURVEY §2.5): value-range frames on
  * second-truncated `unix_timestamp`, current row inclusive, ties share
  * frames; features are computed per split AFTER the chronological split
  * so train windows never see test rows (leakage-free by construction,
  * reference: build_features.py:16-23).
  */
object BehavioralFeatures {

  /** Trailing window over `partitionCol` ordered by unix seconds. */
  def trailingWindow(partitionCol: String, tsUnixCol: String, seconds: Long) =
    Window.partitionBy(partitionCol).orderBy(tsUnixCol).rangeBetween(-seconds, 0)

  /** The reference's exact feature set (build_features.py:26-39):
    * velocity_1h, avg_diff_24h, merchant_diversity; intermediates
    * (`ts_unix`, `avg_amount_24h`) dropped.
    */
  def addFeatures(
      df: DataFrame,
      accountCol: String = "sender_account",
      tsCol: String = "timestamp",
      amountCol: String = "amount",
      receiverCol: String = "receiver_account"): DataFrame = {
    val withTs = df.withColumn("ts_unix", unix_timestamp(col(tsCol)))
    val w1h = trailingWindow(accountCol, "ts_unix", 3600L)
    val w24h = trailingWindow(accountCol, "ts_unix", 86400L)
    val w6h = trailingWindow(accountCol, "ts_unix", 21600L)

    withTs
      .withColumn("velocity_1h", count(col("transaction_id")).over(w1h))
      .withColumn("avg_amount_24h", avg(col(amountCol)).over(w24h))
      .withColumn("avg_diff_24h", col(amountCol) - col("avg_amount_24h"))
      .withColumn("merchant_diversity", size(collect_set(col(receiverCol)).over(w6h)))
      .drop("ts_unix", "avg_amount_24h")
  }

  // ---- Generic trailing-window builders (used by SparkEntry queries over
  // ---- the events table; same operator, reference-independent columns).

  def trailingCount(partitionCol: String, tsUnixCol: String, seconds: Long): Column =
    count(lit(1)).over(trailingWindow(partitionCol, tsUnixCol, seconds))

  /** Exact trailing average via decimal sums: `sum(decimal)/count` instead
    * of `avg(double)`, so the result is order-independent and bit-equal
    * across engines (floating sums are not associative; a segment-tree
    * window implementation would otherwise drift from a sequential one).
    */
  def trailingAvgExact(
      valueCol: Column,
      partitionCol: String,
      tsUnixCol: String,
      seconds: Long): Column = {
    val w = trailingWindow(partitionCol, tsUnixCol, seconds)
    sum(valueCol.cast("decimal(18,2)")).over(w).cast("double") / count(valueCol).over(w)
  }

  def trailingDistinct(
      valueCol: Column,
      partitionCol: String,
      tsUnixCol: String,
      seconds: Long): Column =
    size(collect_set(valueCol).over(trailingWindow(partitionCol, tsUnixCol, seconds)))
}
