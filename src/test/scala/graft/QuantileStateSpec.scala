package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.QuantileStateAgg.{quantileFromState, quantileState, quantileStateMerge}

class QuantileStateSpec extends SparkSpec {
  import spark.implicits._

  private val Err = 0.001 // rank error per digest

  // Skewed (lognormal-ish) values so quantiles are not trivially spaced;
  // deterministic via hash-derived uniforms.
  private lazy val rows: DataFrame = spark.range(20000)
    .select(
      (col("id") % 4).cast("string").as("g"),
      (col("id") % 10).as("day"),
      exp((pmod(hash(col("id")), lit(100000)).cast("double") / 100000.0) * 8.0).as("v"))

  private lazy val sortedByGroup: Map[String, Array[Double]] =
    rows.select("g", "v").as[(String, Double)].collect()
      .groupBy(_._1).map { case (g, a) => g -> a.map(_._2).sorted }

  /** Rank-error check: est must sit within +-(2*eps*n + 1) ranks of q*n.
    * (Two digests merge into one bound-preserving digest; the +1 absorbs
    * boundary rounding.)
    */
  private def assertWithinRank(g: String, q: Double, est: Double): Unit = {
    val data = sortedByGroup(g)
    val n = data.length
    val lo = data.count(_ < est)   // lowest rank est could represent
    val hi = data.count(_ <= est)  // highest
    val target = q * n
    val tol = 2 * Err * n + 1
    assert(lo - tol <= target && target <= hi + tol,
      s"group $g q=$q: est=$est ranks [$lo,$hi] vs target $target (tol $tol)")
  }

  private def quantiles(state: DataFrame): Map[String, (Double, Double)] =
    state.select(col("g"),
        quantileFromState(col("qs"), 0.5).as("p50"),
        quantileFromState(col("qs"), 0.95).as("p95"))
      .as[(String, Double, Double)].collect()
      .map { case (g, a, b) => g -> (a, b) }.toMap

  private def st(df: DataFrame): DataFrame =
    df.groupBy("g").agg(quantileState(col("v"), Err).as("qs"))

  private def mergeStates(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_ unionByName _).groupBy("g")
      .agg(quantileStateMerge(col("qs"), Err).as("qs"))

  test("direct digest answers quantiles within the rank-error bound") {
    for ((g, (p50, p95)) <- quantiles(st(rows))) {
      assertWithinRank(g, 0.5, p50)
      assertWithinRank(g, 0.95, p95)
    }
  }

  test("merged split states preserve the bound, any split") {
    for (splitDay <- Seq(2L, 5L, 8L)) {
      val merged = mergeStates(Seq(
        st(rows.filter(col("day") < splitDay)),
        st(rows.filter(col("day") >= splitDay))))
      for ((g, (p50, p95)) <- quantiles(merged)) {
        assertWithinRank(g, 0.5, p50)
        assertWithinRank(g, 0.95, p95)
      }
    }
  }

  test("chained per-day merges preserve the bound") {
    val perDay = (0L to 9L).map(dy => st(rows.filter(col("day") === dy)))
    for ((g, (p50, p95)) <- quantiles(mergeStates(perDay))) {
      assertWithinRank(g, 0.5, p50)
      assertWithinRank(g, 0.95, p95)
    }
  }

  test("nulls are skipped; empty digest reads as NaN") {
    val withNulls = rows.withColumn("v",
      when(col("day") === 0, lit(null).cast("double")).otherwise(col("v")))
    val got = quantiles(st(withNulls))
    assert(got.keySet == sortedByGroup.keySet)

    val empty = st(rows.filter(lit(false))
      .select(col("g"), col("v")))
    assert(empty.count() == 0)
    val emptyState = st(rows.filter(col("day") < 0)
      .select(lit("z").as("g"), col("v")))
    assert(emptyState.count() == 0)

    // a group whose every value is null still yields a state row; its
    // quantile reads NaN
    val allNull = spark.range(10).select(lit("n").as("g"), lit(null).cast("double").as("v"))
    val q = st(allNull).select(quantileFromState(col("qs"), 0.5)).as[Double].head()
    assert(q.isNaN)
  }
}
