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

  /** Brier score with the Murphy (1973) three-way decomposition per
    * group — the proper-scoring-rule view [[calibrationBins]] only eyeballs:
    *
    *   brier       = mean((score − y)²)                 — total loss
    *   reliability = Σ_k n_k·(mean_score_k − rate_k)²/n — mis-calibration (≥0, want 0)
    *   resolution  = Σ_k n_k·(rate_k − base)²/n         — discrimination (want high)
    *   uncertainty = base·(1 − base)                    — the data's floor
    *
    * over the same `bins` fixed-width buckets as [[calibrationBins]]
    * (so "which bin hurts" cross-references directly). The classic
    * identity brier = REL − RES + UNC holds up to within-bin score
    * variance (exact only when every score in a bin is identical) —
    * emit all four, let the dashboard show the residual.
    *
    * Engine-portable by the house staging: scores arrive grid-rounded,
    * so (score − y) sits on the same 6dp grid and its square is EXACT
    * at decimal scale 12; per-bin diffs are 6dp-rounded BEFORE the
    * square; every fold is an exact decimal sum with one double
    * division at the end. Scale shape: one full-fact aggregation into
    * ≤ `bins` rows per group, everything after is metadata-sized.
    */
  def brierDecomposition(
      df: DataFrame,
      groupCol: String,
      labelCol: Column,
      scoreCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val b = least(floor(scoreCol * bins).cast("long"), lit(bins - 1L))
    val dec6 = "decimal(18,6)"
    // Narrow types for the bounded quantities ([0,1]-ish diffs): the
    // square then weight-multiply must stay UNDER precision 38 or Spark
    // silently drops scale (the decimal-multiply trap in SURVEY).
    val dDiff = "decimal(7,6)"
    val perBin = df.filter(scoreCol.isNotNull)
      .select(col(groupCol), b.as("bin"),
        scoreCol.cast("double").as("__s"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
      .groupBy(col(groupCol), col("bin"))
      .agg(
        count(lit(1)).as("n_k"),
        sum(col("__y")).as("pos_k"),
        sum(col("__s").cast(dec6)).as("__ssum_k"),
        // (s − y) is on the 6dp grid in [-1,1]; its square is exact at
        // scale 12 and precision 15 — the sum stays decimal-exact.
        sum((col("__s").cast(dDiff) - col("__y").cast(dDiff))
          * (col("__s").cast(dDiff) - col("__y").cast(dDiff))).as("__sq_k"))
    val w = Window.partitionBy(groupCol)
    perBin
      .withColumn("__n", sum(col("n_k")).over(w))
      .withColumn("__pos", sum(col("pos_k")).over(w))
      .withColumn("__sq", sum(col("__sq_k")).over(w))
      .withColumn("__base",
        round(col("__pos").cast("double") / col("__n"), 6))
      .withColumn("__ms_k",
        round(col("__ssum_k").cast("double") / col("n_k"), 6))
      .withColumn("__rate_k",
        round(col("pos_k").cast("double") / col("n_k"), 6))
      // Per-bin weighted squares: 6dp diffs square exactly at 12dp,
      // times the long weight stays decimal-exact; the cross-bin fold
      // is an exact decimal sum (≤ bins rows — but order-free anyway).
      .withColumn("__rel_k",
        (round(col("__ms_k") - col("__rate_k"), 6).cast(dDiff)
          * round(col("__ms_k") - col("__rate_k"), 6).cast(dDiff))
          * col("n_k").cast("decimal(20,0)"))
      .withColumn("__res_k",
        (round(col("__rate_k") - col("__base"), 6).cast(dDiff)
          * round(col("__rate_k") - col("__base"), 6).cast(dDiff))
          * col("n_k").cast("decimal(20,0)"))
      .groupBy(col(groupCol))
      .agg(
        max(col("__n")).as("n"),
        max(col("__pos")).as("n_pos"),
        round(max(col("__sq")).cast("double")
          / max(col("__n")), 6).as("brier"),
        round(sum(col("__rel_k")).cast("double") / max(col("__n")), 6)
          .as("reliability"),
        round(sum(col("__res_k")).cast("double") / max(col("__n")), 6)
          .as("resolution"),
        round(max(col("__base")) * (lit(1.0) - max(col("__base"))), 6)
          .as("uncertainty"))
  }

  /** Cohen's kappa (Cohen 1960): chance-corrected agreement between two
    * CATEGORICAL raters over the same units — the standard QC readout
    * for labeled training data (two annotators, or two automatic
    * filters: are they measuring the same thing beyond chance?).
    * po = observed agreement fraction; pe = Σ_k p_a(k)·p_b(k), the
    * agreement two independent raters with these marginals would reach
    * by luck; κ = (po − pe)/(1 − pe). κ is null when pe = 1 (both
    * raters constant — agreement is vacuous, not perfect).
    *
    * One aggregation to the (a, b) confusion cells (bounded by the
    * category-pair count); marginals, the exact integer cross-product
    * fold, and the κ assembly run over that bounded table — no per-unit
    * state. pe's numerator Σ na_k·nb_k stays in the signed-long lane
    * for n up to ~3e9 units (the documented bounded-input posture the
    * rank/tie operators share); the divisions are fixed-order IEEE, so
    * the whole readout replays bitwise in SQL.
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .select(col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = cells.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      coalesce(sum(when(col("a") === col("b"), col("c"))), lit(0L)).as("__agree"))
    val na = cells.groupBy("a").agg(sum(col("c")).as("__na"))
    val nb = cells.groupBy("b").agg(sum(col("c")).as("__nb"))
    val pe = na.join(nb, na("a") === nb("b"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("__spe"))
    val poRaw = col("__agree").cast("double") / col("n").cast("double")
    val peRaw = col("__spe").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    val res = totals.crossJoin(pe)
      .filter(col("n") > 0)
      .select(
        col("n"),
        round(poRaw, 6).as("po"),
        round(peRaw, 6).as("pe"),
        when(peRaw < 1.0, round((poRaw - peRaw) / (lit(1.0) - peRaw), 6))
          .as("kappa"))
      .localCheckpoint(true) // one-row readout; releases the cell cache
    cells.unpersist()
    res
  }

  /** Gwet's AC1 (Gwet 2008, "Computing inter-rater reliability and its
    * variance in the presence of high agreement"): the PARADOX-
    * RESISTANT companion to [[cohenKappa]]. Kappa's chance term uses
    * the raters' own marginals, so two raters who agree 95% of the
    * time on a skewed label (most docs pass a filter) can score a
    * NEGATIVE kappa — the Feinstein-Cicchetti paradox, and exactly the
    * regime quality-filter panels live in. AC1's chance term models
    * random rating only of the "hard" share:
    *   pe_γ = (1/(K−1)) Σ_k π_k(1−π_k),  π_k = (n_ak + n_bk)/(2n)
    *   AC1 = (po − pe_γ)/(1 − pe_γ)
    * Null when K = 1 (one category: chance agreement is vacuous).
    *
    * Same bounded confusion-cell shape as kappa; pe_γ's numerator
    * folds as the exact integer Σ_k m_k(2n − m_k) with m_k the summed
    * marginal, so the readout is fixed-order IEEE over integer folds —
    * bitwise-replayable. m_k(2n − m_k) stays in the signed-long lane
    * for n up to ~1.5e9 (the shared bounded-input posture).
    */
  def gwetAc1(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // missing votes drop as unrated, not as phantom categories: a null
    // surviving the groupBy would never match the USING full join and
    // so would count as an extra category in K and the pe_gamma fold
    // (the r17 advice gap; bradleyTerry shares this input hygiene)
    val cells = df
      .select(col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = cells.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      coalesce(sum(when(col("a") === col("b"), col("c"))), lit(0L)).as("__agree"))
    val na = cells.groupBy("a").agg(sum(col("c")).as("__na"))
    val nb = cells.groupBy("b").agg(sum(col("c")).as("__nb"))
    // summed marginal per category — FULL join: a category one rater
    // never emits still counts toward the other's marginal
    val cat = na.select(col("a").as("k"), col("__na"))
      .join(nb.select(col("b").as("k"), col("__nb")), Seq("k"), "full")
      .select(col("k"),
        (coalesce(col("__na"), lit(0L)) + coalesce(col("__nb"), lit(0L))).as("m"))
    val sk = cat.crossJoin(broadcast(totals.select(col("n").as("__n"))))
      .agg(
        coalesce(sum(col("m") * (lit(2L) * col("__n") - col("m"))), lit(0L))
          .as("__s"),
        count(lit(1)).as("__k"))
    val poRaw = col("__agree").cast("double") / col("n").cast("double")
    val peRaw = col("__s").cast("double") /
      ((lit(2L) * col("n")).cast("double") * (lit(2L) * col("n")).cast("double")
        * (col("__k") - 1).cast("double"))
    val res = totals.crossJoin(sk)
      .filter(col("n") > 0)
      .select(
        col("n"),
        round(poRaw, 6).as("po"),
        when(col("__k") > 1, round(peRaw, 6)).as("pe_gamma"),
        when(col("__k") > 1, round((poRaw - peRaw) / (lit(1.0) - peRaw), 6))
          .as("ac1"))
      .localCheckpoint(true) // one-row readout; releases the cell cache
    cells.unpersist()
    res
  }

  /** Fleiss' kappa (Fleiss 1971): chance-corrected agreement for a
    * FIXED PANEL of m raters per unit — the multi-rater generalization
    * of [[cohenKappa]]. Input is LONG form: one row per (unit, assigned
    * label). Every unit must carry the same rater count m ≥ 2 — Fleiss
    * assumes a balanced design, so an unbalanced panel fails loudly
    * instead of silently reweighting.
    *
    * Per unit, P_i = (Σ_k n_ik² − m)/(m(m−1)); P̄ is their mean;
    * chance agreement P̄e = Σ_k p_k² with p_k the category's share of
    * ALL assignments; κ = (P̄ − P̄e)/(1 − P̄e), null when P̄e = 1.
    * Both numerators fold as EXACT integers (Σ(ss_i − m), Σ c_k²), so
    * the readout is two fixed-order IEEE divisions plus the κ assembly
    * — bitwise-replayable. c_k² stays in the signed-long lane for
    * N·m up to ~3e9 assignments (the shared bounded-input posture).
    */
  def fleissKappa(df: DataFrame, unitCol: String, labelCol: String): DataFrame = {
    val nik = df
      .select(col(unitCol).as("u"), col(labelCol).cast("string").as("k"))
      .filter(col("u").isNotNull && col("k").isNotNull)
      .groupBy("u", "k").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val per = nik.groupBy("u").agg(
      sum(col("c")).as("m"),
      sum(col("c") * col("c")).as("ss"))
    val totals = per.agg(
      countDistinct(col("m")).as("__nm"),
      max(col("m")).as("m_raters"),
      count(lit(1)).as("n_units"),
      sum(col("ss") - col("m")).as("__num"))
    val chk = totals.select(col("__nm"), col("m_raters"), col("n_units")).head()
    // max(m) is null on an empty input — read it null-safely so the
    // require below reports the intended error, not an NPE from the
    // message interpolation.
    val mMax = if (chk.isNullAt(1)) 0L else chk.getLong(1)
    require(chk.getLong(0) == 1 && mMax >= 2,
      s"fleissKappa needs a constant rater count >= 2 per unit; got " +
        s"${chk.getLong(0)} distinct count(s), max m = $mMax - " +
        "balance the panel (or drop under-rated units) upstream")
    // loud long-lane gate (r17 verdict): Σ c_k² is bounded by (N·m)²
    // when one category takes every assignment, so total assignments
    // past √Long.MaxValue could silently wrap the chance numerator into
    // a wrong kappa. Fail loudly instead.
    val totalAssignments = BigInt(chk.getLong(2)) * BigInt(mMax)
    require(totalAssignments <= BigInt(3037000499L),
      s"fleissKappa: $totalAssignments assignments exceed the exact " +
        "signed-long lane for the chance numerator (max 3037000499 = " +
        "sqrt(Long.MaxValue)); shard the panel or pre-aggregate upstream")
    val sck2 = nik.groupBy("k").agg(sum(col("c")).as("__ck"))
      .agg(coalesce(sum(col("__ck") * col("__ck")), lit(0L)).as("__sck2"))
    val pBarRaw = col("__num").cast("double") /
      (col("n_units").cast("double") * col("m_raters").cast("double")
        * (col("m_raters") - 1).cast("double"))
    val peRaw = col("__sck2").cast("double") /
      ((col("n_units") * col("m_raters")).cast("double")
        * (col("n_units") * col("m_raters")).cast("double"))
    val res = totals.crossJoin(sck2)
      .filter(col("n_units") > 0)
      .select(
        col("n_units"), col("m_raters"),
        round(pBarRaw, 6).as("p_bar"),
        round(peRaw, 6).as("p_e"),
        when(peRaw < 1.0, round((pBarRaw - peRaw) / (lit(1.0) - peRaw), 6))
          .as("kappa"))
      .localCheckpoint(true) // one-row readout; releases the nik cache
    nik.unpersist()
    res
  }

  /** WEIGHTED Cohen's kappa for ORDINAL grades (Cohen 1968), quadratic
    * disagreement d_ij = (i−j)²: adjacent grades disagree mildly, far
    * grades heavily — the ordinal twin of [[cohenKappa]], which charges
    * every disagreement equally and so under-credits raters that are
    * merely one grade apart. In disagreement form
    *   κ_w = 1 − D_o/D_e,  D_o = Σ f_ij·d_ij / n,
    *   D_e = Σ r_i·c_j·d_ij / n²   (r, c the raters' marginals),
    * and the (K−1)² weight normalization cancels, so grades need not
    * be contiguous. Both numerators fold as EXACT integers over the
    * bounded confusion cells; two fixed-order IEEE divisions + the
    * assembly replay bitwise. κ null when D_e = 0 (both marginals on
    * one grade). Labels must be integer grades (cast to long).
    */
  def cohenKappaWeighted(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .select(col(aCol).cast("long").as("i"), col(bCol).cast("long").as("j"))
      .filter(col("i").isNotNull && col("j").isNotNull)
      .groupBy("i", "j").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val obs = cells.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      coalesce(sum(col("c") * (col("i") - col("j")) * (col("i") - col("j"))),
        lit(0L)).as("__od"))
    val ra = cells.groupBy("i").agg(sum(col("c")).as("__ri"))
    val cb = cells.groupBy("j").agg(sum(col("c")).as("__cj"))
    val exp = ra.crossJoin(cb)
      .agg(coalesce(sum(col("__ri") * col("__cj")
        * (col("i") - col("j")) * (col("i") - col("j"))), lit(0L)).as("__ed"))
    val doRaw = col("__od").cast("double") / col("n").cast("double")
    val deRaw = col("__ed").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    val res = obs.crossJoin(exp)
      .filter(col("n") > 0)
      .select(
        col("n"),
        round(doRaw, 6).as("d_o"),
        round(deRaw, 6).as("d_e"),
        when(col("__ed") > 0, round(lit(1.0) - doRaw / deRaw, 6))
          .as("kappa_w"))
      .localCheckpoint(true) // one-row readout; releases the cell cache
    cells.unpersist()
    res
  }

  /** Krippendorff's alpha, nominal scale (Krippendorff 1970/2004): the
    * agreement statistic for UNBALANCED panels — raters may abstain, so
    * units carry varying rater counts m_u (exactly the design
    * [[fleissKappa]] refuses). Units with m_u < 2 are unpairable and
    * drop (standard α convention); over the pairable assignments,
    *   D_o = (1/n)·Σ_u [Σ_c n_uc·(m_u − n_uc)] / (m_u − 1)
    *   D_e = [Σ_c n_c·(n − n_c)] / (n·(n − 1))
    *   α = 1 − D_o/D_e,  null when D_e = 0 (single category overall).
    *
    * Portability: the per-unit D_o term is the one rational with a
    * unit-varying denominator, so it lands on the 6dp grid and folds as
    * an exact decimal sum (order-free) — the house staging rule; D_e's
    * numerator folds as exact integers. n_c·(n − n_c) stays in the
    * signed-long lane for n up to ~3e9 (the shared bounded-input
    * posture).
    */
  def krippendorffAlpha(
      df: DataFrame, unitCol: String, labelCol: String): DataFrame = {
    val nik = df
      .select(col(unitCol).as("u"), col(labelCol).cast("string").as("k"))
      .filter(col("u").isNotNull && col("k").isNotNull)
      .groupBy("u", "k").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mPer = nik.groupBy("u").agg(sum(col("c")).as("m"))
    val pairable = mPer.filter(col("m") >= 2)
    val cells = nik.join(pairable, Seq("u"))
    // per-unit disagreement on the 6dp grid, exact decimal fold
    val doTerms = cells
      .withColumn("__d", col("c") * (col("m") - col("c")))
      .groupBy(col("u"), col("m"))
      .agg(sum(col("__d")).as("__du"))
      .select(round(col("__du").cast("double")
        / (col("m") - 1).cast("double"), 6).cast("decimal(28,6)").as("__t"))
      .agg(coalesce(sum(col("__t")), lit(0).cast("decimal(28,6)")).as("__sdo"))
    val totals = cells.groupBy(col("k"))
      .agg(sum(col("c")).as("__ck"))
      .agg(
        coalesce(sum(col("__ck")), lit(0L)).as("n"),
        count(lit(1)).as("__ncat"))
    val deNum = cells.groupBy(col("k")).agg(sum(col("c")).as("__ck"))
      .crossJoin(cells.agg(coalesce(sum(col("c")), lit(0L)).as("__n")))
      .agg(coalesce(sum(col("__ck") * (col("__n") - col("__ck"))), lit(0L))
        .as("__sde"))
    val nUnits = pairable.agg(count(lit(1)).as("n_units"))
    val doRaw = col("__sdo").cast("double") / col("n").cast("double")
    val deRaw = col("__sde").cast("double") /
      (col("n").cast("double") * (col("n") - 1).cast("double"))
    val res = nUnits.crossJoin(totals).crossJoin(doTerms).crossJoin(deNum)
      .filter(col("n") > 0)
      .select(
        col("n_units"), col("n").as("n_assignments"), col("__ncat").as("n_categories"),
        round(doRaw, 6).as("d_o"),
        round(deRaw, 6).as("d_e"),
        when(col("__sde") > 0,
          round(lit(1.0) - doRaw / deRaw, 6)).as("alpha"))
      .localCheckpoint(true) // one-row readout; releases the nik cache
    nik.unpersist()
    res
  }

  /** Krippendorff's alpha, INTERVAL metric (Krippendorff 2004): the
    * graded-label form of [[krippendorffAlpha]] — δ²(c,c') = (c−c')²,
    * so adjacent grades disagree mildly and far grades heavily (what
    * the quadratic weights do for [[cohenKappaWeighted]], but with
    * alpha's unbalanced-panel support: raters may abstain, units with
    * fewer than 2 votes drop as unpairable). Labels must be integer
    * grades.
    *
    * The pair sums collapse to moment identities — per unit,
    *   Σ_{c,c'} n_c·n_c'·(c−c')² = 2·m_u·Σx² − 2·(Σx)²
    * — so both numerators fold as EXACT integers (per-unit sum S1 and
    * square-sum S2); the one unit-varying rational lands on the 6dp
    * grid and folds as an exact decimal (the house staging rule), and
    * the assembly is two fixed-order IEEE divisions — bitwise-
    * replayable. The moment lanes (x², (Σx)², the 2mS2−2S1² assembly)
    * fold in decimal(38,0), so grades up to ~1e18 in magnitude can no
    * longer silently wrap a signed long into a wrong alpha (the r17
    * long-lane caveat, closed by widening instead of a bound).
    */
  def krippendorffAlphaInterval(
      df: DataFrame, unitCol: String, valueCol: String): DataFrame = {
    val v = df
      .select(col(unitCol).as("u"), col(valueCol).cast("long").as("x"))
      .filter(col("u").isNotNull && col("x").isNotNull)
    val xd = col("x").cast("decimal(19,0)")
    val per = v.groupBy("u").agg(
      count(lit(1)).as("m"),
      sum(xd).as("s1"),
      sum(xd * xd).as("s2"))
    val pairable = per.filter(col("m") >= 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val doTerms = pairable
      .select(round(
          (lit(2L) * col("m") * col("s2") - lit(2L) * col("s1") * col("s1"))
            .cast("double") / (col("m") - 1).cast("double"), 6)
        .cast("decimal(28,6)").as("__t"))
      .agg(coalesce(sum(col("__t")), lit(0).cast("decimal(28,6)")).as("__sdo"))
    val totals = pairable.agg(
      count(lit(1)).as("n_units"),
      coalesce(sum(col("m")), lit(0L)).as("n"),
      coalesce(sum(col("s1")), lit(0).cast("decimal(38,0)")).as("__ts1"),
      coalesce(sum(col("s2")), lit(0).cast("decimal(38,0)")).as("__ts2"))
    val deNum = (lit(2L) * col("n") * col("__ts2")
      - lit(2L) * col("__ts1") * col("__ts1"))
    val doRaw = col("__sdo").cast("double") / col("n").cast("double")
    val deRaw = deNum.cast("double") /
      (col("n").cast("double") * (col("n") - 1).cast("double"))
    val res = totals.crossJoin(doTerms)
      .filter(col("n") > 0)
      .select(
        col("n_units"), col("n").as("n_assignments"),
        round(doRaw, 6).as("d_o"),
        round(deRaw, 6).as("d_e"),
        when(deNum > 0, round(lit(1.0) - doRaw / deRaw, 6)).as("alpha"))
      .localCheckpoint(true) // one-row readout; releases the unit cache
    pairable.unpersist()
    res
  }

  /** GOLD-UNIT rater evaluation — the spammer/miscalibration screen
    * every annotation pipeline runs where ground truth exists: a small
    * gold subset carries known labels, and each rater is scored on the
    * gold units it voted on — accuracy with a Wilson 95% interval
    * (small-n honest: a rater seen on 4 gold units cannot print a
    * confident 1.0). This is the MODEL-FREE companion to the
    * [[DawidSkene]] confusion estimates: DS infers rater reliability
    * from consensus, this measures it against truth — disagreement
    * between the two is itself a signal (a coordinated rater bloc
    * fools consensus but not gold). The Wilson tree mirrors
    * [[Preferences.itemWinRates]] / EventAnalytics.rateWilson
    * literally, so the bounds replay in SQL.
    *
    * Scale shape: votes semi-join the (small) gold table, then one
    * rater-keyed integer census — work proportional to gold coverage,
    * never the corpus.
    */
  def raterGoldEval(
      votes: DataFrame,
      unitCol: String,
      raterCol: String,
      labelCol: String,
      gold: DataFrame,
      goldUnitCol: String,
      goldLabelCol: String,
      z: Double = 1.96): DataFrame = {
    val v = votes.select(
        col(unitCol).cast("string").as("u"),
        col(raterCol).cast("string").as("r"),
        col(labelCol).cast("string").as("l"))
      .filter(col("u").isNotNull && col("r").isNotNull && col("l").isNotNull)
    val g = gold.select(
        col(goldUnitCol).cast("string").as("u"),
        col(goldLabelCol).cast("string").as("__gold"))
      .filter(col("u").isNotNull && col("__gold").isNotNull)
    val per = v.join(g, Seq("u"))
      .groupBy("r")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l") === col("__gold"), 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2n = (lit(z) * lit(z)) / nD
    val denom = lit(1.0) + z2n
    val center = (p + z2n / lit(2.0)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD
      + z2n / (lit(4.0) * nD))) / denom
    per.select(col("r").as("rater"), col("n").as("n_gold"),
      col("k").as("n_correct"),
      round(p, 6).as("accuracy"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"))
  }

}
