package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the failure mode AQE does not fix for
  * aggregations and windows (AQE skew handling is join-only, SURVEY §4).
  *
  * Both operators are algebraic rewrites: results are identical to the
  * unsalted form for any input (asserted in SkewSpec and oracle-checked
  * via `q_salted_agg`); only the physical shuffle shape changes.
  */
object Skew {

  /** Two-phase salted count/sum aggregation.
    *
    * Phase 1 groups by (key, salt) — a hot key's rows spread over
    * `numSalts` reducers instead of one; phase 2 re-aggregates the
    * partials by key. Correct for any commutative-monoid aggregate; this
    * helper wires the common count/sum set, and the pattern extends to
    * min/max/approx sketches the same way.
    *
    * The salt is `pmod(hash(saltSource), numSalts)` — deterministic, so
    * runs are reproducible (a `rand()` salt would not be). Pick a
    * saltSource with high cardinality within hot keys (a row id, a
    * timestamp column).
    */
  def saltedAgg(
      df: DataFrame,
      keyCol: String,
      saltSource: Column,
      numSalts: Int,
      counts: Seq[(String, String)], // (output alias, col to count — "*" for rows)
      sums: Seq[(String, Column)]    // (output alias, expression to sum)
  ): DataFrame = {
    val partialCounts = counts.map { case (alias, c) =>
      (if (c == "*") count(lit(1)) else count(col(c))).as(s"__pc_$alias")
    }
    val partialSums = sums.map { case (alias, e) => sum(e).as(s"__ps_$alias") }
    val partial = df
      .withColumn("__salt", pmod(hash(saltSource), lit(numSalts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg((partialCounts ++ partialSums).head, (partialCounts ++ partialSums).tail: _*)
    val finalAggs =
      counts.map { case (alias, _) => sum(col(s"__pc_$alias")).as(alias) } ++
        sums.map { case (alias, _) => sum(col(s"__ps_$alias")).as(alias) }
    partial.groupBy(col(keyCol)).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skew-aware inner equi-join: heavy-hitter keys on the big side are
    * salted N ways and the matching small-side rows are replicated N
    * times, so one hot key occupies N reducers instead of one straggler.
    * Non-heavy keys join 1:1 (salt 0). Exactly the manual form of AQE's
    * skew-join split, usable when AQE can't see the skew (e.g. the skew
    * appears after a filter) or for deterministic plans.
    *
    * `heavyKeys` is small (the top-k hot keys) and is broadcast twice —
    * once into each side's salt assignment.
    */
  def skewedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      heavyKeys: Seq[Any],
      numSalts: Int,
      saltSource: Column): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val heavy = col(bigKey).isin(heavyKeys: _*)
    val saltedBig = big.withColumn(
      "__salt",
      when(heavy, pmod(hash(saltSource), lit(numSalts))).otherwise(lit(0)))
    val heavySmall = col(smallKey).isin(heavyKeys: _*)
    val saltedSmall = small.withColumn(
      "__salt",
      explode(when(heavySmall, sequence(lit(0), lit(numSalts - 1)))
        .otherwise(array(lit(0)))))
    saltedBig
      .join(saltedSmall, saltedBig(bigKey) === saltedSmall(smallKey) &&
        saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  /** Top-k heavy-hitter keys by row count — the driver-side input to
    * [[skewedEquiJoin]]. One aggregation + TakeOrdered; run it on a
    * sample at very large scale.
    */
  def heavyHitters(df: DataFrame, keyCol: String, topK: Int, minCount: Long = 0L): Seq[Any] =
    df.groupBy(keyCol).count()
      .filter(col("count") >= minCount)
      .orderBy(desc("count"))
      .limit(topK)
      .collect()
      .map(_.get(0))
      .toSeq

  /** Count-min sketch, Spark-first: the sketch IS a bounded groupBy.
    * Each row contributes one increment per hash row i, to bucket
    * md5(i:key) mod width; `groupBy(i, bucket).count()` then computes
    * every counter in ONE pass — map-side partial aggregation reduces
    * each partition to ≤ depth×width rows before the shuffle, which is
    * exactly the sketch-merge a hand-rolled TypedImperativeAggregate
    * would do, except the counters stay distributed, the plan stays
    * whole-stage-codegen'd, and the output is queryable/persistable as
    * a (depth×width)-row table regardless of key cardinality.
    *
    * md5-derived bucketing (same primitive as
    * [[graft.functions.TextFunctions.md5TokenHashes]]) keeps the whole
    * sketch engine-replayable — the DuckDB oracle rebuilds identical
    * counters, so even the approximation is hash-checked, not just
    * bounded.
    */
  def cmsCounters(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth x $width")
    df.select(
        posexplode(transform(
          sequence(lit(0), lit(depth - 1)),
          i => pmod(
            conv(substring(md5(concat(i.cast("string"), lit(":"), col(keyCol).cast("string"))),
              1, 15), 16, 10).cast("long"),
            lit(width.toLong)))).as(Seq("i", "bucket")))
      .groupBy("i", "bucket")
      .count()
  }

  /** Point estimates from [[cmsCounters]]: for each key in `keys`, the
    * min over hash rows of its bucket's counter — the classic one-sided
    * CMS estimate (≥ true count, ≤ true + εN w.h.p.). `keys` is the
    * candidate set (exact heavy hitters, a sample, or a dictionary);
    * the join against the ≤ depth×width counter table broadcasts it.
    */
  def cmsEstimate(
      counters: DataFrame,
      keys: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int): DataFrame = {
    val hashed = keys.select(
        col(keyCol),
        posexplode(transform(
          sequence(lit(0), lit(depth - 1)),
          i => pmod(
            conv(substring(md5(concat(i.cast("string"), lit(":"), col(keyCol).cast("string"))),
              1, 15), 16, 10).cast("long"),
            lit(width.toLong)))).as(Seq("i", "bucket")))
    hashed.join(counters, Seq("i", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("count"), lit(0L))).as("cms_count"))
  }
}
