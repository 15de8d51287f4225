package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-based anomaly scoring — the batch statistical complement
  * to the trailing-window deviation features (BehavioralFeatures W2-W3,
  * reference features.py): score each row against its GROUP's
  * distribution instead of its own history.
  *
  * Robust statistics by design: mean/stddev z-scores are themselves
  * dragged by the outliers they are meant to find (masking); the median
  * and the median absolute deviation have a 50% breakdown point, so a
  * fraud burst cannot hide itself by inflating the baseline.
  */
object Anomaly {

  /** Robust z-score per row: (x - median_g) / (1.4826 * MAD_g), where g
    * is the row's group and 1.4826 scales MAD to estimate sigma under
    * normality (1/Phi^-1(0.75)). Rows with |z| > threshold are flagged.
    * MAD = 0 (constant-majority groups) yields null scores, never a
    * division blowup.
    *
    * Scale shape: the fact table is scanned THREE times (the floor for
    * two-level exact medians: the med aggregation, the |x-med|
    * aggregation, and the final scoring join) — the per-group med table
    * is tiny (one row per group) and is persisted so its aggregation
    * runs once instead of once per consumer; both stats joins broadcast.
    * `exact = false` swaps the exact percentile (full per-group value
    * buffer) for approx_percentile's bounded-memory sketch — the 100 TB
    * path, same plan shape.
    */
  def robustZScore(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      threshold: Double = 3.5,
      exact: Boolean = true,
      accuracy: Int = 10000): DataFrame =
    scoreAgainstStats(df, groupCol, valueCol,
      robustStats(df, groupCol, valueCol, exact, accuracy), threshold)

  /** Fit the per-group robust baseline: one (group, med, mad) row per
    * group — the FROZEN-STATS half of the anomaly split. Persisting
    * this table to storage and scoring later batches/streams against
    * it ([[scoreAgainstStats]]) is the production shape: the baseline
    * refreshes on ITS schedule (nightly, on clean history), so an
    * anomaly burst cannot inflate the very statistics meant to catch
    * it — the train/serve separation self-scoring lacks. Columns are
    * `g`/`med`/`mad` (storage-friendly); metadata-sized (one row per
    * group).
    */
  def robustStats(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    def median(c: Column): Column =
      if (exact) percentile(c, lit(0.5))
      else approx_percentile(c, lit(0.5), lit(accuracy))
    // One row per group — persisting is a few KB and stops the med
    // aggregation (a full fact scan) recomputing under each of its two
    // consumers. Dropped by any catalog.clearCache(); lives with the
    // session otherwise (same contract as broadcast dimension caches).
    val meds = df.groupBy(col(groupCol))
      .agg(median(col(valueCol)).as("med"))
      .withColumnRenamed(groupCol, "_g")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mads = df.join(broadcast(meds), col(groupCol) === col("_g")).drop("_g")
      .groupBy(col(groupCol))
      .agg(median(abs(col(valueCol) - col("med"))).as("mad"))
      .withColumnRenamed(groupCol, "_g")
    meds.join(mads, "_g").withColumnRenamed("_g", "g")
  }

  /** Score rows against a (g, med, mad) baseline table — row-local
    * beyond one broadcast of the metadata-sized stats (stream-static
    * joinable, so the same call scores a micro-batch). Rows whose
    * group has NO baseline row score null / not-outlier, like the
    * MAD = 0 convention: no defined baseline, no verdict.
    */
  def scoreAgainstStats(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      stats: DataFrame,
      threshold: Double = 3.5): DataFrame =
    df.join(broadcast(stats.select(col("g").as("_g"),
        col("med").as("_med"), col("mad").as("_mad"))),
        col(groupCol) === col("_g"), "left")
      .drop("_g")
      .withColumn("robust_z",
        when(col("_mad") > 0,
          round((col(valueCol) - col("_med")) / (lit(1.4826) * col("_mad")), 6)))
      .withColumn("is_outlier", coalesce(abs(col("robust_z")) > threshold, lit(false)))
      .withColumnRenamed("_med", "med")
      .withColumnRenamed("_mad", "mad")

  /** SEASONAL robust z-score: score each row against its
    * (group, calendar-bucket) distribution instead of the whole group —
    * "is this value unusual FOR 3 AM" rather than "unusual overall".
    * The fraud/ops question the plain group baseline cannot answer: a
    * mid-range value can be wildly anomalous for its hour while sitting
    * comfortably inside the all-day distribution (spec-pinned with
    * exactly that fixture). Season buckets: "hod" hour-of-day (0-23),
    * "dow" day-of-week (1-7), "how" hour-of-week (0-167).
    *
    * Pure composition: [[robustZScore]] over the composite
    * (group, bucket) key, so the scale shape is inherited (three fact
    * scans, broadcast stats joins, the exact/approx percentile switch)
    * and the stats table grows by at most 168 rows per group — still
    * metadata. The emitted `season_bucket` column names the baseline
    * each row was judged against.
    */
  def seasonalRobustZ(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      valueCol: String,
      season: String = "hod",
      threshold: Double = 3.5,
      exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    val bucket = season match {
      case "hod" => hour(col(tsCol))
      case "dow" => dayofweek(col(tsCol))
      case "how" => (dayofweek(col(tsCol)) - 1) * 24 + hour(col(tsCol))
      case other => throw new IllegalArgumentException(
        s"unknown season '$other' - one of hod, dow, how")
    }
    robustZScore(
        df.withColumn("season_bucket", bucket.cast("int"))
          .withColumn("__sg",
            concat_ws("#", col(groupCol), col("season_bucket"))),
        "__sg", valueCol, threshold, exact, accuracy)
      .drop("__sg")
  }

  /** Tukey-fence (IQR) outliers per group: a row is an outlier when it
    * falls outside [q1 - k*iqr, q3 + k*iqr] of its group (k = 1.5 the
    * classic fence, 3.0 the "far out" fence). Same two-phase shape as
    * [[robustZScore]] with one percentile pass (q1 and q3 share a single
    * aggregation).
    */
  def iqrOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 1.5,
      exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    def pct(c: Column, p: Double): Column =
      if (exact) percentile(c, lit(p))
      else approx_percentile(c, lit(p), lit(accuracy))
    val fences = df.groupBy(col(groupCol))
      .agg(pct(col(valueCol), 0.25).as("_q1"), pct(col(valueCol), 0.75).as("_q3"))
      .withColumnRenamed(groupCol, "_g")
    df.join(fences, col(groupCol) === col("_g")).drop("_g")
      .withColumn("lo", round(col("_q1") - lit(k) * (col("_q3") - col("_q1")), 6))
      .withColumn("hi", round(col("_q3") + lit(k) * (col("_q3") - col("_q1")), 6))
      .withColumn("is_outlier", col(valueCol) < col("lo") || col(valueCol) > col("hi"))
      .drop("_q1", "_q3")
  }
}
