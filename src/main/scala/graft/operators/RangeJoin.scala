package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType}

/** Range (interval) joins — the inequality-predicate joins Spark plans as
  * BroadcastNestedLoopJoin (or a cartesian product when neither side fits
  * in memory): O(|L| x |R|) comparisons regardless of how selective the
  * range predicate is. The scalable rewrite is BIN BUCKETING: quantize the
  * range dimension into fixed-width bins, explode each interval into the
  * bins it covers, map each point to its single bin, and equi-join on the
  * bin id (plus any equality keys). Catalyst then plans an ordinary hash
  * join — shuffled or broadcast, AQE-skew-splittable — and the residual
  * range predicate filters within matching bins only.
  *
  * Pair-multiplicity is handled without a distinct:
  *   - point-in-interval: a point lives in exactly ONE bin, so each
  *     qualifying (point, interval) pair meets exactly once;
  *   - interval-overlap: a pair may share many bins, so we keep only the
  *     FIRST shared bin — the bin of the later of the two starts, which
  *     both intervals cover whenever they truly overlap.
  *
  * Cost model: intervals explode into ceil(len/binWidth)+1 rows. Pick
  * `binWidth` near the typical interval length — larger bins mean fewer
  * replicas but more non-matching pairs for the residual filter; smaller
  * bins the reverse. A bin that is hot on both sides (many points AND
  * many covering intervals) is ordinary join skew, which AQE's skew-join
  * split already handles because the physical operator IS an equi-join.
  */
object RangeJoin {

  /** Type-aware epoch seconds, matching [[AsOfJoin]]: numeric range
    * columns pass through; date/timestamp go via unix_micros under the
    * session (UTC) zone.
    */
  private def epochSeconds(c: Column, dt: DataType): Column = dt match {
    case _: NumericType => c.cast("double")
    case _ => unix_micros(c.cast("timestamp")).cast("double") / lit(1e6)
  }

  private def binOf(epoch: Column, binWidth: Double): Column =
    floor(epoch / lit(binWidth)).cast("long")

  /** Join each point row to every interval row whose [start, end) range
    * contains the point (end-inclusive when `endInclusive`). Output is
    * points.* ++ intervals.*; column names must be disjoint across the
    * two inputs (pre-select/alias otherwise).
    *
    * @param equiKeys   additional equality predicates (pointCol, intervalCol)
    *                   — bins then only need to split ranges WITHIN a key
    * @param binWidth   bin width in the range unit (seconds for temporal
    *                   columns, the raw unit for numeric columns)
    * @param broadcastIntervals hint the exploded interval side as
    *                   broadcastable (dimension-table-sized interval sets)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Double,
      equiKeys: Seq[(String, String)] = Nil,
      endInclusive: Boolean = false,
      broadcastIntervals: Boolean = false): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty, s"column names must be disjoint, shared: $overlap")

    val pEpoch = epochSeconds(col(pointCol), points.schema(pointCol).dataType)
    val sEpoch = epochSeconds(col(startCol), intervals.schema(startCol).dataType)
    val eEpoch = epochSeconds(col(endCol), intervals.schema(endCol).dataType)

    val binnedPoints = points.withColumn("_bin", binOf(pEpoch, binWidth))
    // sequence() is inclusive on both ends; the last bin may be a dead
    // replica for half-open intervals ending on a bin boundary — the
    // residual containment filter discards those pairs.
    val explodedIntervals0 = intervals.withColumn(
      "_bin", explode(sequence(binOf(sEpoch, binWidth), binOf(eEpoch, binWidth))))
    val explodedIntervals =
      if (broadcastIntervals) broadcast(explodedIntervals0) else explodedIntervals0

    val binEq = binnedPoints("_bin") === explodedIntervals("_bin")
    val keyEq = equiKeys.map { case (pk, ik) => binnedPoints(pk) === explodedIntervals(ik) }
    val contains = {
      val p = epochSeconds(binnedPoints(pointCol), points.schema(pointCol).dataType)
      val s = epochSeconds(explodedIntervals(startCol), intervals.schema(startCol).dataType)
      val e = epochSeconds(explodedIntervals(endCol), intervals.schema(endCol).dataType)
      p >= s && (if (endInclusive) p <= e else p < e)
    }
    binnedPoints
      .join(explodedIntervals, (binEq +: keyEq).reduce(_ && _) && contains)
      .drop("_bin")
  }

  /** Join left interval rows to right interval rows that overlap them:
    * lStart < rEnd AND rStart < lEnd (half-open semantics; touching
    * endpoints do not overlap). Each overlapping pair is emitted exactly
    * once — in the bin of greatest(lStart, rStart), which both intervals
    * cover whenever the predicate holds. Output is left.* ++ right.*;
    * column names must be disjoint.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStartCol: String,
      lEndCol: String,
      rStartCol: String,
      rEndCol: String,
      binWidth: Double,
      equiKeys: Seq[(String, String)] = Nil,
      broadcastRight: Boolean = false): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty, s"column names must be disjoint, shared: $overlap")

    def ep(df: DataFrame, c: String): Column = epochSeconds(col(c), df.schema(c).dataType)

    val lExp = left.withColumn(
      "_lbin", explode(sequence(binOf(ep(left, lStartCol), binWidth),
        binOf(ep(left, lEndCol), binWidth))))
    val rExp0 = right.withColumn(
      "_rbin", explode(sequence(binOf(ep(right, rStartCol), binWidth),
        binOf(ep(right, rEndCol), binWidth))))
    val rExp = if (broadcastRight) broadcast(rExp0) else rExp0

    def ep2(src: DataFrame, bound: DataFrame, c: String): Column =
      epochSeconds(bound(c), src.schema(c).dataType)
    val ls = ep2(left, lExp, lStartCol); val le = ep2(left, lExp, lEndCol)
    val rs = ep2(right, rExp, rStartCol); val re = ep2(right, rExp, rEndCol)

    val binEq = lExp("_lbin") === rExp("_rbin")
    val keyEq = equiKeys.map { case (lk, rk) => lExp(lk) === rExp(rk) }
    val overlaps = ls < re && rs < le
    // dedup-free multiplicity control: keep the pair only in the first
    // bin both sides cover — the bin of the later start.
    val firstSharedBin = lExp("_lbin") === floor(greatest(ls, rs) / lit(binWidth)).cast("long")

    lExp.join(rExp, (binEq +: keyEq).reduce(_ && _) && overlaps && firstSharedBin)
      .drop("_lbin", "_rbin")
  }
}
