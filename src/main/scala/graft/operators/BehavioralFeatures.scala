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

  /** Skew-proof trailing count — output-identical to
    * [[trailingCount]] but never materializes a whole hot key's history
    * in one window partition.
    *
    * A plain `partitionBy(key)` range window puts ALL of a key's rows in
    * one task; one hot account (bot, exchange wallet) stalls the stage at
    * 100 TB. Blocking fixes the partition grain: with block =
    * floor(ts / W), a trailing [t-W, t] frame can only touch the row's
    * own block and the one before it, so
    *
    *   count = C_cur(ts <= t within (key, block))            — window over
    *           (key, block): partitions bounded by block width, not by
    *           key heat across time;
    *         + R_prev(ts >= t-W within (key, block-1))       — one forward
    *           as-of lookup into the previous block's suffix-count table
    *           (union + window trick, no pair blowup).
    *
    * Three bounded shuffles instead of one skewed one. Ties share frames
    * (RANGE semantics) in both parts, so results match the plain window
    * exactly — the driver oracle for the blocked query is the SAME SQL as
    * the plain one.
    */
  def blockedTrailingCount(
      df: DataFrame,
      keyCol: String,
      tsUnixCol: String,
      seconds: Long,
      outCol: String): DataFrame = {
    require(seconds > 0, s"window width must be positive, got $seconds")
    val block = floor(col(tsUnixCol) / lit(seconds)).cast("long")
    val base = df.withColumn("_blk", block)

    // Current-block contribution: running count with RANGE tie semantics.
    val wCur = Window.partitionBy(keyCol, "_blk").orderBy(tsUnixCol)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val withCur = base.withColumn("_c_cur", count(lit(1)).over(wCur))

    // Previous-block suffix counts: rcum(ts) = rows with ts' >= ts in the
    // (key, block); probe forward with t-W to get the [t-W, block end]
    // remainder. groupBy first so the as-of right side is one row per
    // distinct timestamp.
    val wSuffix = Window.partitionBy("_gk").orderBy(col(tsUnixCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val suffix = base.groupBy(col(keyCol), col("_blk"), col(tsUnixCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_gk", concat_ws("\u0000", col(keyCol), col("_blk")))
      .withColumn("_rcum", sum(col("_n")).over(wSuffix))
      .select(col("_gk"), col(tsUnixCol).as("_sts"), col("_rcum"))

    val probes = withCur
      .withColumn("_gk", concat_ws("\u0000", col(keyCol), col("_blk") - 1))
      .withColumn("_probe_ts", col(tsUnixCol) - lit(seconds))
    val looked = AsOfJoin.join(
      probes, suffix,
      leftKey = "_gk", rightKey = "_gk",
      leftTs = "_probe_ts", rightTs = "_sts",
      rightPayload = Seq("_rcum"), rightOrderCol = "_sts",
      keepUnmatched = true, direction = "forward")

    looked
      .withColumn(outCol, col("_c_cur") + coalesce(col("_rcum"), lit(0L)))
      .drop("_blk", "_c_cur", "_gk", "_probe_ts", "_rcum")
  }
}
