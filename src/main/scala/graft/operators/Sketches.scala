package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch columns (Apache DataSketches HLL via
  * Spark's built-in `hll_sketch_agg`/`hll_union_agg`/
  * `hll_sketch_estimate`) — the missing monoid for [[IncrementalAgg]]:
  * counts/sums/min/max merge trivially, but `countDistinct` is NOT a
  * monoid, so an incremental or per-partition rollup cannot maintain it
  * exactly without keeping the full key set. The HLL sketch IS a monoid
  * (register-wise max), so distinct counts ride the same
  * state-plus-delta-merge shape as the other aggregates: persist the
  * binary sketch column per key, union new days in, estimate at read.
  *
  * At 100 TB this replaces a global `count(DISTINCT user)` re-scan with
  * a merge over |keys| sketch rows of ~2^lgK bytes each; accuracy is the
  * standard HLL bound (~1.04/sqrt(2^lgK), ~1.6% at the lgK=12 default).
  * Merging is associative, commutative and idempotent-safe across
  * arbitrary re-partitionings of the input (SketchesSpec pins
  * merged == direct as an exact identity, not an approximation: the
  * union of split sketches is byte-equivalent to the sketch of the
  * union).
  */
object Sketches {

  /** Per-key HLL sketch state over `valueCol`. */
  def hllState(df: DataFrame, keys: Seq[String], valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Key-wise union of two sketch-state tables (same schema). */
  def hllMerge(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))

  /** Read-time estimate; the sketch column is retained so the state
    * stays mergeable after the read.
    */
  def hllEstimate(state: DataFrame, alias: String = "distinct_est"): DataFrame =
    state.withColumn(alias, hll_sketch_estimate(col("hll")))
}
