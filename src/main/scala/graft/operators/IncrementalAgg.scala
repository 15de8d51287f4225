package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of grouped aggregates — the 100 TB answer to
  * "a new day of data arrived": never re-scan history. The maintained
  * STATE is a partial-aggregate table, |distinct keys| rows of
  * commutative-monoid columns (count, exact-decimal sums, min, max);
  * folding a delta in costs one aggregation of the delta plus a key-wise
  * merge with the state — work proportional to the delta, not to the
  * history. Derived values that are not monoids (averages, rates) are
  * FINALIZED from the state at read time and never stored, so merges
  * stay associative and the maintained result is bit-identical to a full
  * recompute (asserted in IncrementalAggSpec; oracle-checked via
  * `q_agg_incremental`, whose oracle SQL is the full-recompute query).
  *
  * The same shape serves streaming (foreachBatch folding micro-batch
  * partials into the state table) and backfill (merge per-partition
  * states computed independently — the union-then-re-aggregate is one
  * shuffle of |keys| x #states rows).
  */
object IncrementalAgg {

  /** Aggregate `df` into mergeable partial state: `n` (row count) plus
    * one summed column per `sums` alias and min/max columns per
    * `mins`/`maxs` alias. Sum expressions over doubles should be
    * pre-cast to an exact decimal by the caller so partial sums are
    * order- and grouping-independent (float sums are not associative;
    * decimal sums are).
    */
  def partialState(
      df: DataFrame,
      keys: Seq[String],
      sums: Seq[(String, Column)],
      mins: Seq[(String, Column)] = Nil,
      maxs: Seq[(String, Column)] = Nil): DataFrame = {
    val aggs = (count(lit(1)).as("n") +:
      (sums.map { case (a, e) => sum(e).as(a) } ++
        mins.map { case (a, e) => min(e).as(a) } ++
        maxs.map { case (a, e) => max(e).as(a) }))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two state tables (same schema) key-wise: counts and sums add,
    * mins/maxs combine. Associative and commutative, so states from any
    * partitioning of the input — historical state + today's delta, or
    * per-partition backfill states — merge to the same result.
    */
  def merge(
      state: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    val aggs = (sum(col("n")).as("n") +:
      (sumCols.map(a => sum(col(a)).as(a)) ++
        minCols.map(a => min(col(a)).as(a)) ++
        maxCols.map(a => max(col(a)).as(a))))
    state.unionByName(delta).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
