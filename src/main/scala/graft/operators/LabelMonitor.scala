package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LABEL-QUALITY MONITORING over time — agreement is not a one-shot
  * number: labels ARRIVE in batches (annotation runs, judge-model
  * versions, UI revisions), and the readout a labeling pipeline
  * actually watches is "did agreement drift this week" and "did
  * position bias appear after the presentation change". Labeling is
  * the one pipeline stage that genuinely arrives incrementally, so the
  * monitor follows the store-fed posture of the streaming A/B gates
  * (mSPRT / first-seen SRM). Two layers:
  *
  *   - SLICED readouts: [[kappaBySlice]] computes Cohen's kappa per
  *     slice (time window, annotation batch, judge cohort) from one
  *     sliced cell census, and [[positionBySlice]] the first-position
  *     chi-square gate per slice — the corpus-monitor shape applied to
  *     labels.
  *   - INCREMENTAL state: both censuses are integer COUNT tables —
  *     commutative monoids (the [[IncrementalAgg]] posture).
  *     [[cellState]] folds one batch, [[mergeCellState]] adds states
  *     key-wise, [[kappaFromState]] finalizes at read; likewise
  *     [[positionState]] / [[mergePositionState]] /
  *     [[positionFromState]]. The monitor never rescans history, and a
  *     STREAMED fold (foreachBatch over micro-batches) is
  *     bit-identical to the one-shot batch compute — LabelMonitorSpec
  *     pins streamed == batch on a real file stream.
  *
  * Derived values (po/pe/kappa, rates/chi2) are finalized at READ time
  * and never stored, keeping merges associative; everything is exact
  * integer censuses plus the fixed-order kappa / chi-square assemblies
  * of [[MlEval.cohenKappa]] and [[Preferences.positionBias]] applied
  * per slice — so both the sliced and the store-fed readouts replay in
  * SQL (FULL oracles).
  *
  * Scale shape: one shuffle per batch to the bounded (slice ×
  * category²) state, one bounded merge per fold; finalization is
  * bounded aggregation over the state — work proportional to the
  * delta, never to history.
  */
object LabelMonitor {

  /** Mergeable per-slice agreement state: (slice, a, b, c) integer
    * cell counts. Null slices or votes drop (input hygiene, the
    * [[MlEval.cohenKappa]] posture).
    */
  def cellState(
      df: DataFrame, sliceCol: String, aCol: String, bCol: String): DataFrame =
    df.select(col(sliceCol).cast("string").as("slice"),
        col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
      .filter(col("slice").isNotNull && col("a").isNotNull && col("b").isNotNull)
      .groupBy("slice", "a", "b").agg(count(lit(1)).as("c"))

  /** Key-wise state merge — associative and commutative, so states
    * from any batching of the input merge to the same table.
    */
  def mergeCellState(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy("slice", "a", "b").agg(sum(col("c")).as("c"))

  /** Finalize per-slice Cohen's kappa from a cell state — the exact
    * [[MlEval.cohenKappa]] assembly with a slice key carried through
    * every fold.
    */
  def kappaFromState(state: DataFrame): DataFrame = {
    val totals = state.groupBy("slice").agg(
      sum(col("c")).as("n"),
      coalesce(sum(when(col("a") === col("b"), col("c"))), lit(0L))
        .as("__agree"))
    val na = state.groupBy(col("slice"), col("a"))
      .agg(sum(col("c")).as("__na"))
    val nb = state.groupBy(col("slice").as("__slice_b"), col("b"))
      .agg(sum(col("c")).as("__nb"))
    val pe = na.join(nb,
        col("slice") === col("__slice_b") && col("a") === col("b"))
      .groupBy(col("slice"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("__spe"))
    val poRaw = col("__agree").cast("double") / col("n").cast("double")
    // Known edge (r18 advice, deliberately NOT changed in r19): a slice
    // where the two raters share NO category has no pe row (the a=b
    // join is empty for it), so pe and kappa read NULL here while
    // MlEval.cohenKappa on that slice alone reads pe = 0 and kappa =
    // po. The declared monitor queries' oracles replay THIS null
    // semantics (testdata contains such a slice), so a coalesce would
    // change contract outputs; the per-slice identity is therefore
    // documented as holding on slices where the raters overlap in at
    // least one category.
    val peRaw = col("__spe").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    totals.join(pe, Seq("slice"), "left")
      .filter(col("n") > 0)
      .select(
        col("slice"), col("n"),
        round(poRaw, 6).as("po"),
        round(peRaw, 6).as("pe"),
        when(peRaw < 1.0, round((poRaw - peRaw) / (lit(1.0) - peRaw), 6))
          .as("kappa"))
  }

  /** One-call sliced agreement readout: [[cellState]] then
    * [[kappaFromState]] — rater drift per time window / batch.
    */
  def kappaBySlice(
      df: DataFrame, sliceCol: String, aCol: String, bCol: String): DataFrame =
    kappaFromState(cellState(df, sliceCol, aCol, bCol))

  /** Mergeable per-slice position census: (slice, n, n_first_wins). */
  def positionState(
      df: DataFrame, sliceCol: String, winnerCol: String,
      firstCol: String): DataFrame =
    df.select(col(sliceCol).cast("string").as("slice"),
        col(winnerCol).cast("string").as("w"),
        col(firstCol).cast("string").as("f"))
      .filter(col("slice").isNotNull && col("w").isNotNull && col("f").isNotNull)
      .groupBy("slice")
      .agg(count(lit(1)).as("n"),
        sum(when(col("w") === col("f"), 1L).otherwise(0L)).as("n_first_wins"))

  /** Key-wise position-state merge. */
  def mergePositionState(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy("slice")
      .agg(sum(col("n")).as("n"), sum(col("n_first_wins")).as("n_first_wins"))

  /** Finalize the per-slice position gate — the
    * [[Preferences.positionBias]] chi-square assembly per slice.
    */
  def positionFromState(state: DataFrame): DataFrame = {
    val d = lit(2L) * col("n_first_wins") - col("n")
    val chi2 = (d * d).cast("double") / col("n").cast("double")
    state.filter(col("n") > 0)
      .select(col("slice"), col("n"), col("n_first_wins"),
        round(col("n_first_wins").cast("double") / col("n").cast("double"), 6)
          .as("first_win_rate"),
        round(chi2, 6).as("chi2"),
        (chi2 > 3.841).as("biased"))
  }

  /** One-call sliced position readout. */
  def positionBySlice(
      df: DataFrame, sliceCol: String, winnerCol: String,
      firstCol: String): DataFrame =
    positionFromState(positionState(df, sliceCol, winnerCol, firstCol))
}
