package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): select raw-corpus documents that LOOK LIKE a small
  * target corpus by scoring each document under two bag-of-hashed-
  * n-gram unigram models — log w(d) = log p_target(d) − log p_raw(d) —
  * and resampling proportionally to w. The principled replacement for
  * hand-tuned per-source mixture weights: the target corpus IS the
  * weighting.
  *
  * Feature space: word unigrams + bigrams hashed into `buckets` slots
  * (the paper's hashed n-gram features). Hashing is the engine-portable
  * 60-bit md5 prefix parse (the [[TextFunctions.md5GramHashes]] stream)
  * so the DuckDB oracle recomputes the identical bucket sequence;
  * production throughput could swap in the FNV kernel unchanged.
  *
  * 100 TB shape:
  *   - [[featureCensus]] is one explode + map-combined groupBy into at
  *     most `buckets` rows — census size is O(buckets), independent of
  *     corpus size, and mergeable (plain counts) across shards/batches.
  *   - [[importanceWeights]] scoring is ROW-LOCAL by default: the two
  *     censuses collapse to one dense `buckets`-length log-ratio array
  *     (driver-built, metadata-sized like a centroid table) inlined as
  *     a literal, and each document folds its own bucket sequence over
  *     `element_at` — zero shuffle, zero join on the corpus. Past
  *     `maxInlineBuckets` the ratio table rides an explode + broadcast
  *     join + per-doc re-aggregation instead (one corpus shuffle).
  *   - [[resampleTopK]] runs the Efraimidis–Spirakis race in LOG space
  *     (key = ln(−ln u) − log w), so weights spanning hundreds of nats
  *     never exponentiate; the cutoff comes from the Selection descent
  *     (counters cross the wire, not rows) exactly like
  *     [[TrainingData.exactSampleWeighted]].
  *
  * Determinism: every per-document fold runs over the SORTED bucket
  * sequence (ascending, repeats adjacent), so the float sum is a fixed
  * left-association both here and in the SQL replay — the byteEntropy
  * ascending-order rule applied to gram buckets.
  */
object Dsir {

  /** Per-occurrence hashed feature buckets of a document: word n-grams
    * for each n in `ns`, each hashed to `pmod(md5_60(gram), buckets)`.
    * A multiset (one entry per gram occurrence), sorted ascending so
    * downstream float folds are order-canonical.
    */
  def hashedBuckets(textCol: Column, buckets: Int, ns: Seq[Int] = Seq(1, 2)): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(ns.nonEmpty, "need at least one gram order")
    val all = ns.map(n =>
      TextFunctions.md5GramHashes(textCol, n)).reduce(concat(_, _))
    sort_array(transform(all, h => pmod(h, lit(buckets.toLong)).cast("int")))
  }

  /** Hashed-gram census of a corpus slice: (bucket, cnt) with at most
    * `buckets` rows. Mergeable by summing counts; the target census is
    * typically built from a benchmark-sized slice, the raw census from
    * the corpus itself (or a uniform sample of it — the counts only
    * enter through smoothed frequencies).
    */
  def featureCensus(
      df: DataFrame,
      textCol: String,
      buckets: Int,
      ns: Seq[Int] = Seq(1, 2)): DataFrame =
    df.select(explode(hashedBuckets(col(textCol), buckets, ns)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Dense per-bucket log importance ratio from two censuses, with
    * add-one smoothing on both sides:
    *   lr[b] = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B)).
    * Driver-side: both inputs are ≤ `buckets` rows by construction.
    * Identical census frames yield EXACTLY 0.0 everywhere (the two ln
    * terms cancel symbolically before any float subtraction).
    */
  private def logRatios(
      target: DataFrame,
      raw: DataFrame,
      buckets: Int): Array[Double] = {
    def dense(census: DataFrame): (Array[Long], Double) = {
      val counts = new Array[Long](buckets)
      census.select(col("bucket").cast("int"), col("cnt").cast("long"))
        .collect().foreach(r => counts(r.getInt(0)) = r.getLong(1))
      (counts, counts.sum.toDouble + buckets)
    }
    val (tc, tTot) = dense(target)
    val (rc, rTot) = dense(raw)
    Array.tabulate(buckets) { b =>
      (math.log(tc(b) + 1.0) - math.log(tTot)) -
        (math.log(rc(b) + 1.0) - math.log(rTot))
    }
  }

  /** Score every document: adds `log_weight` = Σ over the doc's sorted
    * hashed-gram occurrences of the bucket's log ratio (0.0 for a
    * gramless doc). `inlineRatios = None` auto-selects the zero-shuffle
    * literal-array fold while `buckets <= maxInlineBuckets` and the
    * explode + broadcast-join + ordered re-fold path past it (the
    * broadcastVocab auto-guard pattern); both paths fold in ascending
    * bucket order and are bit-identical (spec-pinned).
    */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetCensus: DataFrame,
      rawCensus: DataFrame,
      buckets: Int,
      ns: Seq[Int] = Seq(1, 2),
      inlineRatios: Option[Boolean] = None,
      maxInlineBuckets: Int = 1 << 20): DataFrame = {
    val lr = logRatios(targetCensus, rawCensus, buckets)
    val inline = inlineRatios.getOrElse(buckets <= maxInlineBuckets)
    val bs = hashedBuckets(col(textCol), buckets, ns)
    if (inline) {
      val arr = lit(lr)
      df.withColumn("log_weight",
        aggregate(bs, lit(0.0),
          (acc, b) => acc + element_at(arr, b + 1)))
    } else {
      // Ratio table as a broadcast frame; per-occurrence join, then a
      // per-doc re-fold over the SORTED collected occurrences so the
      // summation order matches the inline path exactly.
      val spark = df.sparkSession
      import spark.implicits._
      val ratios = broadcast(
        lr.zipWithIndex.map { case (v, b) => (b, v) }.toSeq.toDF("bucket", "lr"))
      val occ = df.select(col(idCol), explode(bs).as("bucket"))
        .join(ratios, Seq("bucket"))
      val folded = occ.groupBy(idCol)
        .agg(aggregate(
          array_sort(collect_list(struct(col("bucket"), col("lr")))),
          lit(0.0), (acc, s) => acc + s.getField("lr")).as("log_weight"))
      df.join(folded, Seq(idCol), "left")
        .withColumn("log_weight", coalesce(col("log_weight"), lit(0.0)))
    }
  }

  /** Exactly-k resample ∝ exp(log_weight) without replacement — the
    * Efraimidis–Spirakis exponential race in log space: with the house
    * 52-bit md5 uniform u, e = −ln(u)/w and ln e = ln(−ln u) − log w is
    * the same race under a monotone map, so the k SMALLEST log-keys win
    * and exp(log w) is never materialized (log weights of ±hundreds of
    * nats are routine for DSIR over long documents). Deterministic in
    * (id, salt), append-stable; cutoff via the Selection descent, ties
    * broken by id — exactly the [[TrainingData.exactSampleWeighted]]
    * contract shifted to log space. Null log-weights never sample.
    */
  def resampleTopK(
      df: DataFrame,
      idCol: String,
      logWeightCol: Column,
      k: Long,
      salt: String = "",
      tailThreshold: Long = 65536): DataFrame = {
    require(k >= 0, s"sample size must be >= 0, got $k")
    if (k == 0) return df.limit(0)
    val eligible = df.filter(logWeightCol.isNotNull)
    val h52 = conv(
      substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 13),
      16, 10).cast("long")
    val u = (h52 + 1).cast("double") / 4503599627370496.0
    val keyed = eligible.withColumn("__lkey", log(-log(u)) - logWeightCol)
    val n = eligible.count()
    if (k >= n) return eligible
    val cutoff = Selection.kthSmallest(keyed, "__lkey", k, tailThreshold = tailThreshold)
    val below = keyed.filter(col("__lkey") < cutoff)
    val b = below.count()
    require(k - b <= Int.MaxValue, s"boundary take ${k - b} exceeds Int range")
    val boundary = keyed.filter(col("__lkey") === cutoff)
      .orderBy(col(idCol)).limit((k - b).toInt)
    below.unionByName(boundary).drop("__lkey")
  }
}
