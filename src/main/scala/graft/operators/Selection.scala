package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistics — the k-th smallest element of
  * a column without a global sort. The approx stack (GK digests,
  * `percentile_approx`) answers most quantile questions at 100 TB,
  * but "the exact p99 cutoff we will contractually enforce" needs the
  * true element. A global `orderBy` is a full-data range shuffle;
  * this is the classic iterative-histogram selection instead: each
  * round is ONE aggregation pass (map-side partial, 256 (count, min,
  * max) triples per task) that narrows the candidate range by ~256x,
  * so 100 TB reaches a collect-safe remainder in 2-3 scans with
  * nothing but counters crossing the wire.
  *
  * Values are compared in DOUBLE space. The double cast is monotone,
  * so bucket routing is order-correct for any numeric input; ties
  * only ever ERROR TOWARD a wider final bucket, which the exact tail
  * step then resolves. (Longs beyond 2^53 can alias in double space;
  * ranks WITHIN an aliased tie group follow double order — fine for
  * every column in this engine's domain.)
  */
object Selection {

  /** The exact k-th smallest (1-based) value of `valueCol` among its
    * non-null rows. Requires 1 <= k <= count(non-null). NaNs sort
    * last (Spark's total order), nulls are ignored (SQL semantics).
    */
  def kthSmallest(
      df: DataFrame,
      valueCol: String,
      k: Long,
      buckets: Int = 256,
      tailThreshold: Long = 65536): Double = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))

    // One fused pass: totals, NaN tail size, finite range.
    val head0 = base.agg(
      count(lit(1)).as("n"),
      count(when(isnan(col("__v")), 1)).as("nans"),
      min(when(!isnan(col("__v")), col("__v"))).as("mn"),
      max(when(!isnan(col("__v")), col("__v"))).as("mx")).head()
    val n = head0.getLong(0)
    val nans = head0.getLong(1)
    require(k <= n, s"k=$k exceeds non-null count $n")
    // NaN orders after +Infinity in Spark's total order.
    if (k > n - nans) return Double.NaN

    var scoped = base.filter(!isnan(col("__v")))
    var kRem = k
    var cnt = n - nans
    var lo = head0.getDouble(2)
    var hi = head0.getDouble(3)
    var guard = 0
    while (lo != hi && cnt > tailThreshold) {
      guard += 1
      require(guard <= 64, s"selection failed to converge on [$lo,$hi]")
      val w = (hi - lo) / buckets
      // Sub-resolution range: lo != hi but the split width underflows
      // to 0 (denormal territory). Every remaining value is within
      // one representable step of lo — lo IS the answer at double
      // precision.
      if (w == 0) return lo
      val idx = least(lit(buckets - 1),
        greatest(lit(0), floor((col("__v") - lit(lo)) / lit(w)).cast("int")))
      // The one pass per round: per-bucket (count, min, max).
      val hist = scoped.groupBy(idx.as("__b"))
        .agg(count(lit(1)).as("__c"), min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      var acc = 0L
      var b = -1
      var i = 0
      while (b < 0 && i < buckets) {
        val c = hist.get(i).map(_._1).getOrElse(0L)
        if (acc + c >= kRem) b = i else acc += c
        i += 1
      }
      require(b >= 0, s"rank $kRem not found in histogram (count drift?)")
      val (cB, mnB, mxB) = hist(b)
      kRem -= acc
      cnt = cB
      lo = mnB
      hi = mxB
      // Membership must match the histogram's routing exactly, so
      // filter on the SAME bucket index expression, not on range
      // arithmetic that could round differently.
      scoped = scoped.filter(idx === b)
    }
    if (lo == hi) lo
    else
      // Exact tail: TakeOrderedAndProject keeps <= kRem rows per
      // partition and merges on the driver — bounded by threshold.
      scoped.orderBy(col("__v")).limit(kRem.toInt)
        .agg(max(col("__v"))).head().getDouble(0)
  }

  /** Discrete quantile via [[kthSmallest]]: the element at 1-based
    * rank floor(q * (n-1)) + 1 among non-null rows (the
    * lower-nearest-rank definition; q=0 -> min, q=1 -> max).
    */
  def quantileDisc(df: DataFrame, valueCol: String, q: Double): Double = {
    require(q >= 0 && q <= 1, s"q must be in [0,1], got $q")
    val n = df.filter(col(valueCol).isNotNull).count()
    require(n > 0, "quantile of an empty column")
    kthSmallest(df, valueCol, math.floor(q * (n - 1)).toLong + 1)
  }
}
