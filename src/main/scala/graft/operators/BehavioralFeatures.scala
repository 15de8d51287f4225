package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
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
    *
    * The 24h mean uses the exact decimal form ([[trailingAvgExact]]) —
    * `sum(decimal)/count`, not `avg(double)` — so the value is
    * order-independent AND bit-equal to [[addFeaturesBlocked]]'s
    * recombined partials (floating sums are not associative; a blocked
    * recombination of double partials would drift in the last ulp).
    */
  def addFeatures(
      df: DataFrame,
      accountCol: String = "sender_account",
      tsCol: String = "timestamp",
      amountCol: String = "amount",
      receiverCol: String = "receiver_account",
      idCol: String = "transaction_id"): DataFrame = {
    val withTs = df.withColumn("ts_unix", unix_timestamp(col(tsCol)))
    val w1h = trailingWindow(accountCol, "ts_unix", 3600L)
    val w6h = trailingWindow(accountCol, "ts_unix", 21600L)

    withTs
      .withColumn("velocity_1h", count(col(idCol)).over(w1h))
      .withColumn("avg_amount_24h",
        trailingAvgExact(col(amountCol), accountCol, "ts_unix", 86400L))
      .withColumn("avg_diff_24h", col(amountCol) - col("avg_amount_24h"))
      .withColumn("merchant_diversity", size(collect_set(col(receiverCol)).over(w6h)))
      .drop("ts_unix", "avg_amount_24h")
  }

  /** Skew-proof variant of [[addFeatures]] — same three features, same
    * column names, types, and values (bit-equal; the identity is pinned in
    * BehavioralFeaturesSpec), but every window runs in its blocked form
    * ([[blockedTrailingCount]] / [[blockedTrailingAvgExact]] /
    * [[blockedTrailingDistinct]]), so no task ever materializes a whole
    * hot account's history. This is the pipeline entry to use at 100 TB:
    * one bot/exchange wallet with 10^8 rows stalls `addFeatures`' single
    * range-window stage, while here each feature costs three BOUNDED
    * shuffles (per-(key, block) window + suffix table + as-of probe —
    * ScaleStress measured 27x on hot keys).
    *
    * The three widths differ (1h / 24h / 6h), so the blocks can't share a
    * partitioning — the features chain as three independent blocked
    * probes. That is 9 bounded shuffles vs `addFeatures`' 1 skewed one:
    * the right trade precisely when key heat, not shuffle count, is the
    * stage-killer; on skew-free data prefer [[addFeatures]].
    *
    * Identity caveat: `velocity_1h` here counts rows where the plain form
    * counts non-null `idCol` — identical whenever `idCol` is the table's
    * primary key (true for the reference schema and every driver table).
    */
  def addFeaturesBlocked(
      df: DataFrame,
      accountCol: String = "sender_account",
      tsCol: String = "timestamp",
      amountCol: String = "amount",
      receiverCol: String = "receiver_account"): DataFrame = {
    val withTs = df.withColumn("ts_unix", unix_timestamp(col(tsCol)))
    val withVel =
      blockedTrailingCount(withTs, accountCol, "ts_unix", 3600L, "velocity_1h")
    val withAvg =
      blockedTrailingAvgExact(withVel, amountCol, accountCol, "ts_unix", 86400L, "avg_amount_24h")
    val withDiv =
      blockedTrailingDistinct(withAvg, receiverCol, accountCol, "ts_unix", 21600L, "merchant_diversity")
    withDiv
      .withColumn("avg_diff_24h", col(amountCol) - col("avg_amount_24h"))
      .drop("ts_unix", "avg_amount_24h")
      // Pin addFeatures' exact column order (withColumn appends).
      .select(df.columns.map(col) ++
        Seq(col("velocity_1h"), col("avg_diff_24h"), col("merchant_diversity")): _*)
  }

  // ---- Generic trailing-window builders (used by SparkEntry queries over
  // ---- the events table; same operator, reference-independent columns).

  def trailingCount(partitionCol: String, tsUnixCol: String, seconds: Long): Column =
    count(lit(1)).over(trailingWindow(partitionCol, tsUnixCol, seconds))

  /** Exact trailing average via decimal sums: `sum(decimal)/count` instead
    * of `avg(double)`, so the result is order-independent and bit-equal
    * across engines (floating sums are not associative; a segment-tree
    * window implementation would otherwise drift from a sequential one).
    *
    * decimal(38,12): wide enough that any double's useful precision
    * survives the cast (doubles carry ~15-17 significant digits; 12
    * fractional + 26 integral digits covers every realistic measure,
    * and a 2dp money column is represented exactly), and the sum's
    * result type stays decimal(38,12) so blocked partials recombine
    * without loss. A narrow money-scale cast (decimal(18,2)) would
    * silently round sub-cent values per ROW before summing.
    */
  private[graft] val ExactSumType = "decimal(38,12)"

  def trailingAvgExact(
      valueCol: Column,
      partitionCol: String,
      tsUnixCol: String,
      seconds: Long): Column = {
    val w = trailingWindow(partitionCol, tsUnixCol, seconds)
    sum(valueCol.cast(ExactSumType)).over(w).cast("double") / count(valueCol).over(w)
  }

  def trailingDistinct(
      valueCol: Column,
      partitionCol: String,
      tsUnixCol: String,
      seconds: Long): Column =
    size(collect_set(valueCol).over(trailingWindow(partitionCol, tsUnixCol, seconds)))

  /** Batch gap-based sessionization: a new session starts when more than
    * `gapSeconds` of event time pass between a key's consecutive events.
    * Pure window composition — lag flags session starts, a running sum
    * numbers them (both cumulative row frames: O(n) per key, no sliding
    * re-aggregation). Rows sharing a timestamp always land in the same
    * session, so output is deterministic under tie reordering. The batch
    * analogue of the streaming `sessionize` operator; per-key sequential
    * by nature (the recurrence cannot split like the blocked windows).
    */
  def sessionIndex(
      df: DataFrame,
      keyCol: String,
      tsUnixCol: String,
      gapSeconds: Long,
      outCol: String = "session_idx",
      // Extra window-order columns for deterministic lag under duplicate
      // timestamps, and a 1-based numbering switch (each key's first
      // event opens session 1 instead of 0) — defaults preserve the r3
      // contract exactly; EventAnalytics rides the non-defaults.
      tieBreak: Seq[Column] = Nil,
      oneBased: Boolean = false): DataFrame = {
    require(gapSeconds > 0, s"session gap must be positive, got $gapSeconds")
    val wOrd = Window.partitionBy(keyCol).orderBy(col(tsUnixCol) +: tieBreak: _*)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsUnixCol), 1).over(wOrd)
    val isNew =
      if (oneBased) when(prev.isNull || col(tsUnixCol) - prev > gapSeconds, 1).otherwise(0)
      else when(col(tsUnixCol) - prev > gapSeconds, 1).otherwise(0)
    df.withColumn("_new_sess", isNew)
      .withColumn(outCol, sum(col("_new_sess")).over(wCum))
      .drop("_new_sess")
  }

  /** Per-session summaries over [[sessionIndex]]'s numbering: event
    * count, bounds, duration. One additional hash aggregation on
    * (key, session) — the grain a downstream features table joins on.
    */
  def sessionStats(
      df: DataFrame,
      keyCol: String,
      tsUnixCol: String,
      gapSeconds: Long): DataFrame =
    sessionIndex(df, keyCol, tsUnixCol, gapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsUnixCol)).as("session_start"),
        max(col(tsUnixCol)).as("session_end"),
        (max(col(tsUnixCol)) - min(col(tsUnixCol))).as("duration_s"))

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
      outCol: String): DataFrame =
    blockedProbe(df, keyCol, tsUnixCol, seconds,
      curAggs = Seq("_c_cur" -> (w => count(lit(1)).over(w))),
      suffixGroupAggs = Seq(count(lit(1)).as("_n")),
      suffixCumAggs = Seq("_rcum" -> (w => sum(col("_n")).over(w))))
      .withColumn(outCol, col("_c_cur") + coalesce(col("_rcum"), lit(0L)))
      .drop("_c_cur", "_rcum")

  /** Skew-proof exact trailing average — output-identical to
    * [[trailingAvgExact]] (the reference's W2 `avg_amount_24h` shape).
    * Decimal partial sums make the blocked recombination bit-equal to the
    * sequential window: `(sum_cur + sum_prev)` is the exact decimal
    * window sum, cast to double once, divided by the exact count.
    */
  def blockedTrailingAvgExact(
      df: DataFrame,
      valueCol: String,
      keyCol: String,
      tsUnixCol: String,
      seconds: Long,
      outCol: String): DataFrame =
    blockedProbe(df, keyCol, tsUnixCol, seconds,
      curAggs = Seq(
        "_s_cur" -> (w => sum(col(valueCol).cast(ExactSumType)).over(w)),
        "_c_cur" -> (w => count(col(valueCol)).over(w))),
      suffixGroupAggs = Seq(
        sum(col(valueCol).cast(ExactSumType)).as("_s"),
        count(col(valueCol)).as("_n")),
      suffixCumAggs = Seq(
        "_rsum" -> (w => sum(col("_s")).over(w)),
        "_rcum" -> (w => sum(col("_n")).over(w))))
      .withColumn(outCol,
        (col("_s_cur") + coalesce(col("_rsum"), lit(0).cast(ExactSumType))).cast("double")
          / (col("_c_cur") + coalesce(col("_rcum"), lit(0L))))
      .drop("_s_cur", "_c_cur", "_rsum", "_rcum")

  /** Skew-proof trailing distinct count — output-identical to
    * [[trailingDistinct]] (the reference's W4 `merchant_diversity` shape).
    * Distinct state is carried as sets: the current-block running set
    * unions with the previous block's suffix set (values occurring at
    * ts' >= t-W). Set sizes are bounded by 2W of one key's traffic, not
    * by the key's whole history.
    */
  def blockedTrailingDistinct(
      df: DataFrame,
      valueCol: String,
      keyCol: String,
      tsUnixCol: String,
      seconds: Long,
      outCol: String): DataFrame =
    blockedProbe(df, keyCol, tsUnixCol, seconds,
      curAggs = Seq("_cset" -> (w => collect_set(col(valueCol)).over(w))),
      suffixGroupAggs = Seq(collect_set(col(valueCol)).as("_vs")),
      suffixCumAggs = Seq(
        "_rset" -> (w => array_distinct(flatten(collect_list(col("_vs")).over(w))))))
      .withColumn(outCol,
        when(col("_rset").isNull, size(col("_cset")))
          .otherwise(size(array_union(col("_cset"), col("_rset")))))
      .drop("_cset", "_rset")

  /** Shared core of the blocked trailing windows: per-(key, block)
    * current-frame aggregates with RANGE tie semantics, plus one forward
    * as-of probe into the previous block's suffix-aggregate table.
    *
    *   1. `curAggs` run over `partitionBy(key, block).orderBy(ts)
    *      .rangeBetween(unboundedPreceding, currentRow)` — partitions are
    *      bounded by block width, never by key heat across time;
    *   2. `suffixGroupAggs` collapse the input to one row per distinct
    *      (key, block, ts); `suffixCumAggs` then accumulate those in
    *      descending-ts order, so the row at ts holds the aggregate of
    *      the block's [ts, end] suffix;
    *   3. each input row probes (key, block-1) forward at t-W via
    *      [[AsOfJoin]] (union + window — one hash shuffle, no pair
    *      blowup); probed columns are null when the previous block is
    *      empty or fully expired.
    *
    * The (key, block) group key is a struct column — no string
    * concatenation, no separator collisions, hash-partitions like any
    * composite key. Because block width == window width, a trailing
    * [t-W, t] frame touches at most the row's own block and the one
    * before it; callers combine cur + probed columns into the exact
    * plain-window result.
    */
  private def blockedProbe(
      df: DataFrame,
      keyCol: String,
      tsUnixCol: String,
      seconds: Long,
      curAggs: Seq[(String, WindowSpec => Column)],
      suffixGroupAggs: Seq[Column],
      suffixCumAggs: Seq[(String, WindowSpec => Column)]): DataFrame = {
    require(seconds > 0, s"window width must be positive, got $seconds")
    val base = df.withColumn("_blk", floor(col(tsUnixCol) / lit(seconds)).cast("long"))

    val wCur = Window.partitionBy(keyCol, "_blk").orderBy(tsUnixCol)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val withCur = curAggs.foldLeft(base) { case (d, (name, f)) => d.withColumn(name, f(wCur)) }

    val wSuffix = Window.partitionBy("_gk").orderBy(col(tsUnixCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumNames = suffixCumAggs.map(_._1)
    val grouped = base.groupBy(col(keyCol), col("_blk"), col(tsUnixCol))
      .agg(suffixGroupAggs.head, suffixGroupAggs.tail: _*)
      .withColumn("_gk", struct(col(keyCol), col("_blk")))
    val suffix = suffixCumAggs.foldLeft(grouped) { case (d, (name, f)) =>
        d.withColumn(name, f(wSuffix))
      }
      .select(col("_gk") +: col(tsUnixCol).as("_sts") +: cumNames.map(col): _*)

    val probes = withCur
      .withColumn("_gk", struct(col(keyCol), (col("_blk") - 1).as("_blk")))
      .withColumn("_probe_ts", col(tsUnixCol) - lit(seconds))
    AsOfJoin.join(
      probes, suffix,
      leftKey = "_gk", rightKey = "_gk",
      leftTs = "_probe_ts", rightTs = "_sts",
      rightPayload = cumNames, rightOrderCol = "_sts",
      keepUnmatched = true, direction = "forward")
      .drop("_blk", "_gk", "_probe_ts")
  }
}
