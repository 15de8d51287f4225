package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classifier evaluation over scored corpora — the measurement layer a
  * quality-filtering pipeline needs BEFORE it trusts a score column to
  * gate training data: ROC/AUC (does the score rank good above bad at
  * all), the ROC operating points (which threshold buys which
  * tpr/fpr), and calibration (does "0.8" mean 80%). All three are
  * exact and engine-portable BY CONSTRUCTION, not by float luck:
  *
  *  - AUC is computed as the Mann-Whitney U statistic (Mann & Whitney
  *    1947; Hanley & McNeil 1982 for the AUC identity) from INTEGER
  *    rank sums — doubled to absorb tie half-credits, so every
  *    intermediate is a BIGINT and the one double division happens
  *    last. No trapezoid float accumulation, no summation-order risk.
  *  - ROC points are cumulative integer counts over the distinct-score
  *    table; tpr/fpr are single integer-ratio divisions per row.
  *  - Calibration bins stage the mean predicted score through exact
  *    decimal sums (scores arrive on a rounded grid) and the observed
  *    rate as an integer ratio.
  *
  * Scale shape: one (group, score) count aggregation bounds everything
  * downstream by DISTINCT SCORES per group (scores are grid-rounded —
  * metadata-sized), not rows; the rank window for U runs over that
  * same bounded table using count-weighted rank identities rather than
  * per-row ranks. No collect, no driver loops.
  */
object MlEval {

  /** Exact ROC-AUC per group via Mann-Whitney U. `labelCol` must be a
    * boolean column (true = positive); `scoreCol` any orderable
    * numeric. Returns (group, n_pos, n_neg, auc) with auc = P(score of
    * a random positive > score of a random negative) + half credit for
    * ties, rounded to 6dp; null when a group lacks both classes.
    *
    * Tie handling uses midranks via the count identity: for a distinct
    * score s with c rows starting at rank r (1-based, ascending), each
    * row's doubled midrank is 2r + c - 1. Summing over positives:
    * 2·Σ midrank_pos = Σ_s pos_s · (2·r_s + c_s − 1) — every term a
    * BIGINT from the (group, score) counts, so U needs no per-row
    * window at all, only a cumulative count over the distinct-score
    * table. 2U = that sum − n_pos(n_pos+1); auc = 2U / (2·n_pos·n_neg).
    */
  def rocAuc(
      df: DataFrame,
      groupCol: String,
      labelCol: Column,
      scoreCol: Column): DataFrame = {
    val counts = scoreCounts(df, groupCol, labelCol, scoreCol)
    val wCum = Window.partitionBy(groupCol).orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      // rank of the first row at this score = 1 + (rows strictly below)
      .withColumn("__below",
        sum(col("pos") + col("neg")).over(wCum) - (col("pos") + col("neg")))
      .withColumn("__term",
        col("pos") * (lit(2L) * (col("__below") + 1L)
          + (col("pos") + col("neg")) - 1L))
      .groupBy(col(groupCol))
      .agg(
        sum(col("pos")).as("n_pos"),
        sum(col("neg")).as("n_neg"),
        sum(col("__term")).as("__rank2"))
      .withColumn("__u2",
        col("__rank2") - col("n_pos") * (col("n_pos") + 1L))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double")
            / (lit(2L) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** ROC operating points per group: one row per DISTINCT observed
    * score (the candidate thresholds t = that score, predicting
    * positive when score >= t), descending-threshold cumulative tp/fp
    * plus tpr/fpr — the curve [[rocAuc]] summarizes. Integer counts
    * throughout; the two ratios are single divisions per row.
    */
  def rocCurve(
      df: DataFrame,
      groupCol: String,
      labelCol: Column,
      scoreCol: Column): DataFrame = {
    val counts = scoreCounts(df, groupCol, labelCol, scoreCol)
    val wDesc = Window.partitionBy(groupCol).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    counts
      .withColumn("tp", sum(col("pos")).over(wDesc))
      .withColumn("fp", sum(col("neg")).over(wDesc))
      .withColumn("n_pos", sum(col("pos")).over(wAll))
      .withColumn("n_neg", sum(col("neg")).over(wAll))
      .select(col(groupCol), col("score").as("threshold"),
        col("tp"), col("fp"),
        when(col("n_pos") > 0,
          round(col("tp").cast("double") / col("n_pos"), 6)).as("tpr"),
        when(col("n_neg") > 0,
          round(col("fp").cast("double") / col("n_neg"), 6)).as("fpr"))
  }

  /** Precision-recall operating points per group: one row per distinct
    * observed score (threshold t, predicting positive when score >= t),
    * descending-threshold cumulative integer tp/fp, precision =
    * tp/(tp+fp) and recall = tp/n_pos — each a SINGLE integer-ratio
    * division, so portable per IEEE without staging. The PR twin of
    * [[rocCurve]] for the imbalanced-corpus regime where ROC flatters
    * (n_neg dwarfs n_pos and fpr stays tiny no matter how bad the
    * precision gets — Davis & Goadrich 2006).
    */
  def prCurve(
      df: DataFrame,
      groupCol: String,
      labelCol: Column,
      scoreCol: Column): DataFrame = {
    val counts = scoreCounts(df, groupCol, labelCol, scoreCol)
    val wDesc = Window.partitionBy(groupCol).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    counts
      .withColumn("tp", sum(col("pos")).over(wDesc))
      .withColumn("fp", sum(col("neg")).over(wDesc))
      .withColumn("n_pos", sum(col("pos")).over(wAll))
      .select(col(groupCol), col("score").as("threshold"),
        col("tp"), col("fp"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .as("precision"),
        when(col("n_pos") > 0,
          round(col("tp").cast("double") / col("n_pos"), 6)).as("recall"))
  }

  /** Step-interpolated average precision per group (the area under
    * [[prCurve]] as sklearn defines it): AP = Σ_k (R_k − R_{k−1})·P_k
    * over descending thresholds = (1/n_pos) Σ_k pos_k · tp_k/(tp_k+fp_k).
    * Each TERM is a pure function of integer counts (one IEEE division
    * + one multiply — identical doubles in any engine), but the SUM
    * over thresholds is float and unordered, so the house discipline
    * applies: every term is rounded onto a 12dp grid, the grid values
    * fold as exact decimals (order-free), and the one final division
    * by n_pos happens on the exact total. Null when a group has no
    * positives.
    */
  def averagePrecision(
      df: DataFrame,
      groupCol: String,
      labelCol: Column,
      scoreCol: Column): DataFrame = {
    val counts = scoreCounts(df, groupCol, labelCol, scoreCol)
    val wDesc = Window.partitionBy(groupCol).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("tp", sum(col("pos")).over(wDesc))
      .withColumn("fp", sum(col("neg")).over(wDesc))
      .withColumn("__term",
        round(col("pos") * col("tp").cast("double")
          / (col("tp") + col("fp")), 12).cast("decimal(28,12)"))
      .groupBy(col(groupCol))
      .agg(sum(col("pos")).as("n_pos"), sum(col("__term")).as("__ap_sum"))
      .select(col(groupCol), col("n_pos"),
        when(col("n_pos") > 0,
          round(col("__ap_sum").cast("double") / col("n_pos"), 6))
          .as("avg_precision"))
  }

  /** The best-F1 operating point per group: the threshold maximizing
    * F1 = 2·tp / (2·tp + fp + fn), highest threshold winning ties.
    * F1 per row is ONE integer-ratio division (portable); the argmax
    * orders by that double, which both engines compute bit-identically
    * from the same integers. Groups with no positives emit no row (F1
    * is identically 0 at every threshold — there is no operating
    * point to report).
    */
  def bestF1(
      df: DataFrame,
      groupCol: String,
      labelCol: Column,
      scoreCol: Column): DataFrame = {
    val counts = scoreCounts(df, groupCol, labelCol, scoreCol)
    val wDesc = Window.partitionBy(groupCol).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val scored = counts
      .withColumn("tp", sum(col("pos")).over(wDesc))
      .withColumn("fp", sum(col("neg")).over(wDesc))
      .withColumn("n_pos", sum(col("pos")).over(wAll))
      .filter(col("n_pos") > 0)
      .withColumn("f1",
        round(lit(2L) * col("tp").cast("double")
          / (lit(2L) * col("tp") + col("fp") + (col("n_pos") - col("tp"))),
          6))
    val wRank = Window.partitionBy(groupCol)
      .orderBy(col("f1").desc, col("score").desc)
    scored
      .withColumn("__rn", row_number().over(wRank))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col("score").as("threshold"),
        col("tp"), col("fp"), col("f1"))
  }

  /** Reliability (calibration) bins per group: scores in [0, 1] fall
    * into `bins` fixed-width buckets (the top edge closes into the last
    * bin); per bucket, the count, the mean predicted score
    * (decimal-staged — the score column is expected grid-rounded, as
    * every engine scorer here emits), and the observed positive rate
    * (integer ratio). mean_score ≈ pos_rate per bin = calibrated.
    */
  def calibrationBins(
      df: DataFrame,
      groupCol: String,
      labelCol: Column,
      scoreCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val b = least(floor(scoreCol * bins).cast("long"), lit(bins - 1L))
    // Null scores are dropped, mirroring scoreCounts: floor(null) would
    // otherwise mint a null bin, and Spark sorts nulls first while
    // DuckDB sorts them last — a row-order (and hash) divergence.
    df.filter(scoreCol.isNotNull)
      .select(col(groupCol), b.as("bin"),
        scoreCol.cast("double").as("__s"), labelCol.as("__y"))
      .groupBy(col(groupCol), col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        round(sum(col("__s").cast("decimal(18,6)")).cast("double")
          / count(col("__s")), 6).as("mean_score"))
      .withColumn("pos_rate",
        round(col("n_pos").cast("double") / col("n"), 6))
  }

  /** The shared (group, distinct score) positive/negative counts —
    * the one full-fact pass all three evaluators reduce through.
    * Null scores are dropped (a scoreless row cannot sit on either
    * side of any threshold); null labels are rejected upstream by the
    * boolean column contract.
    */
  private def scoreCounts(
      df: DataFrame,
      groupCol: String,
      labelCol: Column,
      scoreCol: Column): DataFrame =
    df.filter(scoreCol.isNotNull)
      .select(col(groupCol), scoreCol.as("score"), labelCol.as("__y"))
      .groupBy(col(groupCol), col("score"))
      .agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("neg"))
}
