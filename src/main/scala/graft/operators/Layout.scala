package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional (Z-order) clustering for
  * file skipping. A table sorted on one column prunes scans only on
  * that column; interleaving the bits of several columns' bucket
  * indices produces a space-filling-curve key whose sort groups rows
  * that are close in EVERY dimension — so per-file min/max stats stay
  * narrow on all of them and a multi-dimensional predicate skips most
  * files (the OSS Delta/Iceberg OPTIMIZE ZORDER idea, rebuilt on plain
  * repartitionByRange + parquet).
  *
  * Scale shape: the z-value is a pure row-local expression (codegen'd
  * CASE chain + bit arithmetic, no UDF); the only movement is the one
  * range shuffle any clustered write needs. Quantile boundaries cost
  * one approxQuantile pass (sketch-based, driver gets 2^bits doubles).
  */
object Layout {

  /** Bucket index in [0, boundaries.size] for `c` by boundary search:
    * index i of the first boundary >= c, else boundaries.size. Nulls
    * land in bucket 0 (they sort first, as in range partitioning).
    * Expressed as a foldRight CASE chain — 2^bits-1 comparisons inside
    * whole-stage codegen, no UDF.
    */
  def bucketIndex(c: Column, boundaries: Seq[Double]): Column = {
    require(boundaries.nonEmpty, "need at least one boundary")
    require(boundaries == boundaries.sorted, "boundaries must be ascending")
    val chain = boundaries.zipWithIndex.foldRight(lit(boundaries.size): Column) {
      case ((b, i), rest) => when(c <= lit(b), lit(i)).otherwise(rest)
    }
    when(c.isNull, lit(0)).otherwise(chain)
  }

  /** Evenly spaced boundaries over [min, max] for 2^bits buckets —
    * oracle-reproducible in plain SQL; use [[quantileBoundaries]] for
    * skewed columns.
    */
  def linearBoundaries(min: Double, max: Double, bits: Int): Seq[Double] = {
    require(bits >= 1 && bits <= 15, s"bits must be in [1,15], got $bits")
    require(max > min, s"need max > min, got [$min, $max]")
    val n = 1 << bits
    (1 until n).map(i => min + (max - min) * i / n)
  }

  /** Equi-depth boundaries from an approxQuantile sketch: each bucket
    * holds ~1/2^bits of the rows regardless of skew — the production
    * choice (a hot value range otherwise collapses most rows into few
    * buckets and the curve degenerates toward a linear sort).
    */
  def quantileBoundaries(
      df: DataFrame,
      colName: String,
      bits: Int,
      relativeError: Double = 0.001): Seq[Double] = {
    require(bits >= 1 && bits <= 15, s"bits must be in [1,15], got $bits")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    df.stat.approxQuantile(colName, probs, relativeError).toSeq
  }

  /** Interleave the low `bits` bits of each bucket column into one
    * Z-value: bit i of dimension j lands at position i * dims + j
    * (dimension 0 takes the least significant lane). Pure bit
    * arithmetic on longs — codegen-friendly, at most 15 bits x 4 dims.
    */
  def zValue(bucketCols: Seq[Column], bits: Int): Column = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    require(bucketCols.size <= 4, s"at most 4 dimensions, got ${bucketCols.size}")
    require(bits >= 1 && bits <= 15, s"bits must be in [1,15], got $bits")
    val dims = bucketCols.size
    val terms = for {
      (bc, j) <- bucketCols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(bc.cast("long"), i).bitwiseAND(lit(1L)), i * dims + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-value for raw value columns + per-column boundaries (buckets via
    * [[bucketIndex]]). Boundary lists may have any (possibly different)
    * sizes; bits is derived from the largest.
    */
  def zValueFor(colsWithBoundaries: Seq[(Column, Seq[Double])]): Column = {
    val bits = colsWithBoundaries
      .map(cb => math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(cb._2.size.toLong)))
      .max.toInt
    zValue(colsWithBoundaries.map { case (c, b) => bucketIndex(c, b) }, bits)
  }

  /** Hilbert-curve value for the same bucket columns [[zValue]] takes —
    * a drop-in alternative clustering key. Both curves visit every cell
    * once; Hilbert additionally never jumps (consecutive positions are
    * grid neighbors), so sorted runs cut into files keep min/max ranges
    * at least as narrow per dimension — strictly better file pruning on
    * the same one-shuffle write (LayoutSpec measures both). Z remains
    * the choice when the key must be SQL-portable bit arithmetic.
    */
  def hilbertValue(bucketCols: Seq[Column], bits: Int): Column =
    graft.plans.CurveExpressions.hilbertIndex(bucketCols, bits)

  /** Hilbert value for raw value columns + per-column boundaries —
    * mirrors [[zValueFor]].
    */
  def hilbertValueFor(colsWithBoundaries: Seq[(Column, Seq[Double])]): Column = {
    val bits = colsWithBoundaries
      .map(cb => math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(cb._2.size.toLong)))
      .max.toInt
    hilbertValue(colsWithBoundaries.map { case (c, b) => bucketIndex(c, b) }, bits)
  }

  /** Compaction report: bytes are input parquet sizes (compression
    * preserved within ~a few percent on re-write, so the file-count
    * math holds).
    */
  final case class CompactionStats(
      filesBefore: Long, bytesBefore: Long, filesAfter: Long)

  /** Compact a parquet directory's small files into ~`targetFileBytes`
    * files — streaming sinks and per-partition writers accrete files
    * whose per-file open/footer cost eventually dominates scans; file
    * count is sized from the actual input bytes, not guessed. With
    * `sortCols` the output is range-partitioned and sorted, so a
    * z-ordered or time-ordered layout KEEPS its file-pruning property
    * through compaction (plain `repartition` would shred it); without,
    * a round-robin repartition balances file sizes exactly.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil): CompactionStats = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val files = {
      val it = fs.listFiles(path, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f.getLen
      }
      buf.toSeq
    }
    require(files.nonEmpty, s"no parquet files under $inDir")
    val totalBytes = files.sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val repartitioned =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nOut)
    repartitioned.write.mode("overwrite").parquet(outDir)
    CompactionStats(files.size.toLong, totalBytes, nOut.toLong)
  }

  /** Cluster `df` on the Z-curve of the given (column, boundaries)
    * dimensions and write `numFiles` parquet files: range-partition on
    * the z-value (equal-size output files via range sampling), sort
    * within each partition, keep `zCol` in the output (it is the
    * cluster key a reader or compactor re-uses). One shuffle total.
    */
  def writeZOrdered(
      df: DataFrame,
      colsWithBoundaries: Seq[(String, Seq[Double])],
      outDir: String,
      numFiles: Int,
      zCol: String = "z_value"): Unit =
    writeCurveOrdered(df, colsWithBoundaries, outDir, numFiles, zCol, zValueFor)

  /** [[writeZOrdered]] on the Hilbert curve — same bucketing, same one
    * range shuffle, better per-file min/max locality.
    */
  def writeHilbertOrdered(
      df: DataFrame,
      colsWithBoundaries: Seq[(String, Seq[Double])],
      outDir: String,
      numFiles: Int,
      hCol: String = "h_value"): Unit =
    writeCurveOrdered(df, colsWithBoundaries, outDir, numFiles, hCol, hilbertValueFor)

  private def writeCurveOrdered(
      df: DataFrame,
      colsWithBoundaries: Seq[(String, Seq[Double])],
      outDir: String,
      numFiles: Int,
      curveCol: String,
      curve: Seq[(Column, Seq[Double])] => Column): Unit = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    df.withColumn(curveCol, curve(colsWithBoundaries.map { case (n, b) => (col(n), b) }))
      .repartitionByRange(numFiles, col(curveCol))
      .sortWithinPartitions(col(curveCol))
      .write.mode("overwrite").parquet(outDir)
  }
}
