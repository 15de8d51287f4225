package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DAWID-SKENE LABEL AGGREGATION (Dawid & Skene 1979, "Maximum
  * likelihood estimation of observer error-rates using the EM
  * algorithm"): the truth-inference step every annotation / judge-model
  * pipeline runs AFTER measuring agreement — the kappa/alpha family
  * (see [[MlEval.cohenKappa]] etc.) says whether raters agree; this
  * produces the CONSENSUS LABELS, weighting each rater by its own
  * estimated confusion matrix instead of counting votes equally (a
  * reliable annotator outvotes two noisy ones, and a systematically
  * confused one gets its flips corrected, not just discounted).
  *
  * EM over soft labels:
  *   - E: P(unit u is class j) ∝ prior_j · Π_{(r,l) votes on u} π_r(j,l)
  *   - M: π_r(j,l) = Σ_u p(u,j)·[r voted l on u] / Σ_u p(u,j)·[r voted on u]
  *        prior_j  = Σ_u p(u,j) / N
  * initialized from vote shares (majority voting), Laplace-smoothed by
  * `smoothing` so no class or confusion cell ever hard-zeroes.
  *
  * BITWISE-REPLAYABLE FIT (the [[Preferences.bradleyTerry]] posture —
  * almost no engine makes an EM fit oracle-checkable): every posterior
  * iterate lands on the 6dp grid; the M-step numerators/denominators
  * fold those grid values as EXACT decimals (order-free sums); each π
  * and prior is ONE fixed-order IEEE division rounded back to the
  * grid; and the E-step's product over a unit's votes folds in SORTED
  * (rater, label) order from an explicit array fold, with the class
  * total folded in sorted-class order — so a FIXED sweep count replays
  * exactly in SQL with the sweeps unrolled as CTEs.
  *
  * Scale shape: votes fold once per sweep into the bounded confusion
  * grid (raters × classes²) and class priors; the per-unit E-step is
  * one |votes|×L join + a unit-keyed aggregation — work proportional
  * to votes × classes, never units², with the posterior state
  * localCheckpoint'd so plan depth stays constant across sweeps.
  * Caveat: the per-unit product underflows double for panels of many
  * hundreds of raters (items × judges is the normal grain — panels are
  * small); [[fit]] GUARDS this — a null/NaN posterior fails loudly
  * instead of shipping a silent NaN consensus. The class count L is
  * assumed bounded (it is the label vocabulary, not data-scale).
  */
object DawidSkene {

  /** The fitted model: `posterior` (u, j, p) — P(unit u is class j),
    * 6dp; `confusion` (r, j, l, pi) — the COMPLETE raters × classes²
    * grid, smoothed; `priors` (j, prior).
    */
  final case class DawidSkeneFit(
      posterior: DataFrame, confusion: DataFrame, priors: DataFrame)

  /** Fit by `iters` EM sweeps over long-form votes (one row per
    * (unit, rater, label) observation; raters may abstain on any unit
    * — unlike [[MlEval.fleissKappa]] the panel need not be balanced).
    * `iters = 0` returns the vote-share initialization unchanged — the
    * majority-vote identity pin (uniform raters = plain voting).
    */
  def fit(
      df: DataFrame,
      unitCol: String,
      raterCol: String,
      labelCol: String,
      iters: Int = 10,
      smoothing: Double = 0.01): DawidSkeneFit = {
    require(iters >= 0 && iters <= 50, s"iters in [0,50], got $iters")
    require(smoothing > 0.0, s"smoothing must be > 0, got $smoothing")
    val votes = df.select(
        col(unitCol).cast("string").as("u"),
        col(raterCol).cast("string").as("r"),
        col(labelCol).cast("string").as("l"))
      .filter(col("u").isNotNull && col("r").isNotNull && col("l").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val classes = votes.select(col("l").as("j")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nClasses = classes.count()
    val nUnits = votes.select("u").distinct().count()
    // driver-side smoothing aggregate: α·L (the denominator add-on);
    // replays as the literal product in SQL (power-of-two-free double
    // products are written identically on both engines)
    val aL = smoothing * nClasses.toDouble

    // init: vote shares over the full unit × class grid (zero-vote
    // classes participate from sweep 1 via the smoothed priors/π)
    val m = votes.groupBy("u").agg(count(lit(1)).as("__m"))
    val cnt = votes.groupBy("u", "l").agg(count(lit(1)).as("__c"))
    var post = m.crossJoin(broadcast(classes))
      .join(cnt.withColumnRenamed("l", "j"), Seq("u", "j"), "left")
      .select(col("u"), col("j"),
        round(coalesce(col("__c"), lit(0L)).cast("double")
          / col("__m").cast("double"), 6).as("p"))
      .localCheckpoint(true)

    def mStep(p: DataFrame): (DataFrame, DataFrame) = {
      // confusion numerators: exact decimal folds of grid posteriors
      val num = votes.join(p, Seq("u"))
        .groupBy("r", "j", "l")
        .agg(sum(col("p").cast("decimal(28,6)")).as("__num"))
      val den = num.groupBy("r", "j")
        .agg(sum(col("__num")).as("__den"))
      // complete grid: raters × classes² with unobserved cells at the
      // smoothing floor (they never join a vote, but the CONFUSION
      // READOUT must show the full matrix)
      val grid = votes.select(col("r")).distinct()
        .crossJoin(broadcast(classes))
        .crossJoin(broadcast(classes.select(col("j").as("l"))))
      val conf = grid
        .join(num, Seq("r", "j", "l"), "left")
        .join(den, Seq("r", "j"), "left")
        .select(col("r"), col("j"), col("l"),
          round((coalesce(col("__num"), lit(0).cast("decimal(28,6)"))
              .cast("double") + lit(smoothing))
            / (coalesce(col("__den"), lit(0).cast("decimal(28,6)"))
              .cast("double") + lit(aL)), 6).as("pi"))
      val priors = p.groupBy("j")
        .agg(sum(col("p").cast("decimal(28,6)")).as("__mass"))
        .select(col("j"),
          round((col("__mass").cast("double") + lit(smoothing))
            / (lit(nUnits.toDouble) + lit(aL)), 6).as("prior"))
      (conf, priors)
    }

    for (_ <- 1 to iters) {
      val (conf, priors) = mStep(post)
      // E: ONE unit-keyed shuffle per sweep (r17 fusion — was two
      // groupBys plus a join). Per unit, the votes collect once sorted
      // by (class, rater, label); per class the product folds over the
      // class's sublist in SORTED (rater, label) order — the same
      // pinned IEEE multiply chain as the unfused form (a global
      // (j,r,l,pi) sort filtered to one class IS the (r,l,pi) sort) —
      // and the class total folds in sorted-class order row-locally.
      // Priors enter as a literal class-sorted array (they are a
      // bounded per-sweep aggregate; the collect is one tiny action).
      val priorArr = priors.orderBy("j").collect()
        .map(r => struct(lit(r.getString(0)).as("j"),
          lit(r.getDouble(1)).as("prior")))
      post = votes.join(broadcast(conf), Seq("r", "l"))
        .groupBy("u")
        .agg(array_sort(collect_list(
          struct(col("j"), col("r"), col("l"), col("pi")))).as("__vs"))
        .withColumn("__nums", transform(array(priorArr.toSeq: _*), p =>
          struct(p.getField("j").as("j"),
            (p.getField("prior") * aggregate(
              filter(col("__vs"), v => v.getField("j") === p.getField("j")),
              lit(1.0),
              (acc, x) => acc * x.getField("pi"))).as("num"))))
        .withColumn("__tot", aggregate(col("__nums"), lit(0.0),
          (acc, x) => acc + x.getField("num")))
        .select(col("u"), explode(transform(col("__nums"), x =>
          // the > 0 gate is inert on healthy data (same division, same
          // rounding) — it exists so a fully-underflowed unit (every
          // class product at 0.0) surfaces as a null posterior for the
          // loud require below instead of an opaque ANSI 0/0 error
          // mid-job
          struct(x.getField("j").as("j"),
            when(col("__tot") > 0.0,
              round(x.getField("num") / col("__tot"), 6)).as("p")))).as("__pj"))
        .select(col("u"), col("__pj.j").as("j"), col("__pj.p").as("p"))
        .localCheckpoint(true)
    }

    val (confRaw, priorsRaw) = mStep(post)
    // Materialize the bounded fit outputs so the persisted inputs can be
    // released (r17 advice: repeated fits in a long-lived session
    // accreted votes/classes caches with no release path). conf is
    // raters × classes², priors is classes — both tiny by grain; the
    // posterior is already localCheckpoint'd per sweep.
    val conf = confRaw.localCheckpoint(true)
    val priors = priorsRaw.localCheckpoint(true)
    votes.unpersist()
    classes.unpersist()
    // Loud underflow gate (r17 advice): a unit's per-class vote-product
    // folds raw 6dp π values from 1.0, so panels of many hundreds of
    // raters can exhaust double range — num/__tot then goes 0/0 → NaN
    // (or null once propagated). Panels are small by grain (items ×
    // judges), so this is a structural caveat — but it must fail
    // loudly, never ship a silent NaN consensus. One bounded scan of
    // the checkpointed posterior.
    require(
      post.filter(col("p").isNull || isnan(col("p"))).limit(1).count() == 0L,
      "DawidSkene.fit: posterior underflowed to null/NaN — a unit's " +
        "per-class vote product exhausted double range (panel too large " +
        "for the pinned product fold); reduce the per-unit panel size " +
        "or shard the vote set")
    DawidSkeneFit(post, conf, priors)
  }

  /** Consensus labels from a fitted posterior: per unit the maximum-
    * posterior class, ties to the lexicographically smaller label (the
    * deterministic tie-break), with the winning posterior attached.
    */
  def consensus(posterior: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("p").desc, col("j").asc)
    posterior
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("u"), col("j").as("label"), col("p").as("p_posterior"))
  }

  /** ACTIVE-VOTE ROUTING readout — the "needs more votes" queue every
    * annotation pipeline drains: units whose fitted posterior MARGIN
    * (top class minus runner-up) falls below `marginBelow`, with the
    * current consensus label, the margin, and the unit's vote count —
    * so the next labeling batch goes where the model is least sure,
    * not round-robin. Pure composition of the oracled posterior chain:
    * the margin is one 6dp-grid subtraction of two grid posteriors and
    * the vote census one unit-keyed count, so the whole queue replays
    * in SQL on top of the unrolled EM sweeps.
    *
    * Scale shape: one unit-keyed window rank over the posterior
    * (units × L rows, L bounded) + one vote census — nothing beyond
    * the fit's own cost.
    */
  def route(
      df: DataFrame,
      unitCol: String,
      raterCol: String,
      labelCol: String,
      iters: Int = 10,
      smoothing: Double = 0.01,
      marginBelow: Double = 0.5): DataFrame = {
    val f = fit(df, unitCol, raterCol, labelCol, iters, smoothing)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("p").desc, col("j").asc)
    val ranked = f.posterior.withColumn("__rn", row_number().over(w))
    val top = ranked.filter(col("__rn") === 1)
      .select(col("u"), col("j").as("label"), col("p").as("__p1"))
    val second = ranked.filter(col("__rn") === 2)
      .select(col("u"), col("p").as("__p2"))
    val nVotes = df.select(
        col(unitCol).cast("string").as("u"),
        col(raterCol).cast("string").as("r"),
        col(labelCol).cast("string").as("l"))
      .filter(col("u").isNotNull && col("r").isNotNull && col("l").isNotNull)
      .groupBy("u").agg(count(lit(1)).as("n_votes"))
    top.join(second, Seq("u"), "left")
      .select(col("u"), col("label"), col("__p1").as("p_posterior"),
        round(col("__p1") - coalesce(col("__p2"), lit(0.0)), 6).as("margin"))
      .filter(col("margin") < marginBelow)
      .join(nVotes, Seq("u"))
  }

  /** One-call form: fit + consensus. */
  def label(
      df: DataFrame,
      unitCol: String,
      raterCol: String,
      labelCol: String,
      iters: Int = 10,
      smoothing: Double = 0.01): DataFrame =
    consensus(fit(df, unitCol, raterCol, labelCol, iters, smoothing).posterior)
}
