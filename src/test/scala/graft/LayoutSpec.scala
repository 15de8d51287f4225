package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Partition-count-independent uniforms in [0,1): hash of the row id
    * over a FIXED-partitioning range. rand(seed) values depend on the
    * task split (= core count), so file-box margins asserted from them
    * would not be machine-stable; xxhash64 of the id is a pure function
    * of the data.
    */
  private def uniformCols(n: Long, saltedNames: (String, Int)*): org.apache.spark.sql.DataFrame =
    spark.range(0, n, 1, 8).select(saltedNames.map { case (name, salt) =>
      (pmod(xxhash64(col("id"), lit(salt)), lit(1000000L)) / 1000000.0).as(name)
    }: _*)

  test("bucketIndex: boundary search with null and clamp semantics") {
    val df = Seq(Some(0.1), Some(0.25), Some(0.3), Some(0.6), Some(0.9), None).toDF("v")
    val got = df.select(Layout.bucketIndex(col("v"), Seq(0.25, 0.5, 0.75)).as("b"))
      .as[Int].collect().toSeq
    // <=0.25 -> 0, <=0.5 -> 1, <=0.75 -> 2, else 3; null -> 0
    assert(got == Seq(0, 0, 1, 2, 3, 0))
    intercept[IllegalArgumentException](Layout.bucketIndex(col("v"), Seq(0.5, 0.25)))
  }

  test("zValue interleaves dimension bits (dim 0 in the low lane)") {
    val df = Seq((1, 2)).toDF("a", "b")
    // a=01: bit0 -> pos 0. b=10: bit1 -> pos 1*2+1 = 3. z = 1 + 8 = 9.
    val z = df.select(Layout.zValue(Seq(col("a"), col("b")), bits = 2).as("z"))
      .as[Long].head()
    assert(z == 9L)
    // Locality sanity: adjacent cells differ in few curve positions —
    // the 2x2 block (0,0),(1,0),(0,1),(1,1) is exactly z 0,1,2,3.
    val block = Seq((0, 0), (1, 0), (0, 1), (1, 1)).toDF("a", "b")
      .select(Layout.zValue(Seq(col("a"), col("b")), bits = 2).as("z"))
      .as[Long].collect().toSeq
    assert(block == Seq(0L, 1L, 2L, 3L))
  }

  test("linear and quantile boundaries agree on uniform data, diverge on skew") {
    val uniform = spark.range(20000).select((col("id") % 1000).cast("double").as("v"))
    val lin = Layout.linearBoundaries(0, 999, 2)
    val quant = Layout.quantileBoundaries(uniform, "v", 2)
    lin.zip(quant).foreach { case (l, q) => assert(math.abs(l - q) < 50, s"$l vs $q") }
    // 90% of mass at v < 10: equi-depth boundaries all crowd below 10,
    // linear ones do not — that is the whole point of the quantile form.
    val skewed = spark.range(20000).select(
      when(col("id") % 10 < 9, col("id") % 10).otherwise(col("id") % 1000)
        .cast("double").as("v"))
    val qs = Layout.quantileBoundaries(skewed, "v", 2)
    assert(qs.count(_ < 10.0) >= 2, s"equi-depth boundaries should crowd the hot range: $qs")
  }

  test("compact merges small files to the byte-sized target; sortCols keep pruning") {
    val root = s"target/tmp/compact_${System.nanoTime()}"
    val df = spark.range(200000).select(col("id"), rand(5).as("x"))
    df.repartition(64).write.parquet(s"$root/small")

    def parquetFiles(dir: String): Seq[java.io.File] =
      new java.io.File(dir).listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
    val smallFiles = parquetFiles(s"$root/small")
    assert(smallFiles.size == 64)

    val target = smallFiles.map(_.length).sum / 4 // aim for ~4 files
    val stats = Layout.compact(spark, s"$root/small", s"$root/big", target)
    assert(stats.filesBefore == 64)
    assert(stats.filesAfter <= 5)
    assert(parquetFiles(s"$root/big").size == stats.filesAfter)
    // Content identical.
    assert(spark.read.parquet(s"$root/big").count() == 200000)
    assert(spark.read.parquet(s"$root/big").agg(sum("id")).head.getLong(0)
      == df.agg(sum("id")).head.getLong(0))

    // With sortCols, compacted files hold DISJOINT id ranges (pruning
    // survives); round-robin compaction interleaves everything.
    Layout.compact(spark, s"$root/small", s"$root/sorted", target, sortCols = Seq("id"))
    val ranges = spark.read.parquet(s"$root/sorted")
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "file id ranges overlap")
      case _ =>
    }
    intercept[IllegalArgumentException](Layout.compact(spark, s"$root/small", s"$root/x", 0))
  }

  test("hilbert2: pinned xy2d values, bijective, consecutive cells are neighbors") {
    import graft.plans.Kernels
    // Pinned against an independent xy2d implementation (8x8 grid).
    val pinned = Seq(((0L, 0L), 0L), ((7L, 0L), 63L), ((0L, 7L), 21L),
      ((7L, 7L), 42L), ((3L, 4L), 31L), ((5L, 2L), 55L))
    pinned.foreach { case ((x, y), d) =>
      assert(Kernels.hilbert2(3, x, y) == d, s"hilbert2(3, $x, $y)")
    }
    val grid = for { x <- 0L until 8L; y <- 0L until 8L } yield (x, y)
    val idx = grid.map { case (x, y) => (x, y) -> Kernels.hilbert2(3, x, y) }.toMap
    assert(idx.values.toSeq.sorted == (0L until 64L), "bijection over the full grid")
    // The defining Hilbert property: curve never jumps.
    val inv = idx.map(_.swap)
    (0L until 63L).foreach { d =>
      val ((x1, y1), (x2, y2)) = (inv(d), inv(d + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
    // Clamping, matching bucketIndex's range contract.
    assert(Kernels.hilbert2(3, -5L, 9L) == Kernels.hilbert2(3, 0L, 7L))
  }

  test("hilbertN (Skilling): bijective + unit steps in 3 and 4 dims") {
    import graft.plans.Kernels
    def check(dims: Int, bits: Int): Unit = {
      val side = 1 << bits
      val cells = Seq.fill(dims)(0 until side)
        .foldLeft(Seq(Seq.empty[Int]))((acc, r) => acc.flatMap(p => r.map(p :+ _)))
      val idx = cells.map(c => c -> Kernels.hilbertN(bits, c.map(_.toLong).toArray)).toMap
      assert(idx.values.toSeq.sorted == (0L until (1L << (dims * bits))),
        s"bijection dims=$dims bits=$bits")
      val inv = idx.map(_.swap)
      (0L until inv.size - 1L).foreach { d =>
        val dist = inv(d).zip(inv(d + 1)).map { case (a, b) => math.abs(a - b) }.sum
        assert(dist == 1, s"jump at d=$d (dims=$dims bits=$bits)")
      }
    }
    check(3, 2)
    check(4, 2)
    check(3, 3)
  }

  test("hilbertValue column (codegen path) agrees with the kernel") {
    import graft.plans.Kernels
    val df = (for { x <- 0 to 7; y <- 0 to 7 } yield (x.toLong, y.toLong)).toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        Layout.hilbertValue(Seq(col("a"), col("b")), bits = 3).as("h"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) => assert(h == Kernels.hilbert2(3, x, y)) }
    val got3 = df.select(col("a"), col("b"), lit(1L).as("c"))
      .select(Layout.hilbertValue(Seq(col("a") % 4, col("b") % 4, col("c")), bits = 2).as("h"),
        (col("a") % 4).as("a"), (col("b") % 4).as("b"))
      .as[(Long, Long, Long)].collect()
    got3.foreach { case (h, x, y) => assert(h == Kernels.hilbert3(2, x, y, 1L)) }
  }

  test("hilbert layout prunes both dimensions; tighter file boxes than z-order") {
    // 12 files, NOT 16: when the file count aligns with quadrant
    // boundaries (powers of 4 cells per file) both curves cut into
    // perfect squares and tie; misaligned cuts are where Hilbert's
    // no-jump property pays (a Z chunk spanning a quadrant boundary
    // jumps across the space, bloating that file's bounding box). At 12
    // files over an 8x8 grid the cell-exact model gives total bbox area
    // 80 (Hilbert) vs 112 (Z).
    val n = 100000
    val df = uniformCols(n, "x" -> 7, "y" -> 13)
    val bounds = Layout.linearBoundaries(0.0, 1.0, 3)
    val root = s"target/tmp/hilbert_${System.nanoTime()}"
    Layout.writeZOrdered(df, Seq("x" -> bounds, "y" -> bounds), s"$root/z", numFiles = 12)
    Layout.writeHilbertOrdered(df, Seq("x" -> bounds, "y" -> bounds), s"$root/h", numFiles = 12)

    def fileBoxes(dir: String): Array[(Double, Double, Double, Double)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .select("x0", "x1", "y0", "y1")
        .as[(Double, Double, Double, Double)].collect()

    def touched(boxes: Array[(Double, Double, Double, Double)],
        xr: Option[(Double, Double)], yr: Option[(Double, Double)]): Int =
      boxes.count { case (x0, x1, y0, y1) =>
        xr.forall { case (lo, hi) => !(x1 < lo || x0 > hi) } &&
        yr.forall { case (lo, hi) => !(y1 < lo || y0 > hi) }
      }

    val (zBoxes, hBoxes) = (fileBoxes(s"$root/z"), fileBoxes(s"$root/h"))
    // Hilbert meets the same absolute pruning bar as the z layout...
    Seq((0.05, 0.10), (0.40, 0.45), (0.80, 0.85)).foreach { b =>
      assert(touched(hBoxes, Some(b), None) <= 8, s"hilbert x-band $b")
      assert(touched(hBoxes, None, Some(b)) <= 8, s"hilbert y-band $b")
      assert(touched(hBoxes, Some(b), Some(b)) <= 4, s"hilbert 2-D box $b")
    }
    // ...and beats it on the query-independent locality metric: total
    // bounding-box area across files (what an arbitrary box probe pays
    // in expectation). Cell-exact margin is 80 vs 112; boundary-cell
    // spill blurs both, so require h < z rather than a fixed ratio.
    def totalArea(boxes: Array[(Double, Double, Double, Double)]): Double =
      boxes.map { case (x0, x1, y0, y1) => (x1 - x0) * (y1 - y0) }.sum
    val (zArea, hArea) = (totalArea(zBoxes), totalArea(hBoxes))
    assert(hArea < zArea,
      f"hilbert total bbox area $hArea%.3f should undercut z-order's $zArea%.3f")
  }

  test("3-D: hilbert file boxes stay tighter than z-order's (bounding-volume sum)") {
    // Same misaligned-cut setup as the 2-D comparison, one dimension up:
    // 4x4x4 grid (bits=2), 12 files over 64 cells — 5-6 cells per file
    // never tile sub-cubes, so Z's quadrant jumps inflate its boxes.
    val n = 100000
    val df = uniformCols(n, "x" -> 7, "y" -> 13, "u" -> 19)
    val bounds = Layout.linearBoundaries(0.0, 1.0, 2)
    val dims = Seq("x" -> bounds, "y" -> bounds, "u" -> bounds)
    val root = s"target/tmp/hilbert3_${System.nanoTime()}"
    Layout.writeZOrdered(df, dims, s"$root/z", numFiles = 12)
    Layout.writeHilbertOrdered(df, dims, s"$root/h", numFiles = 12)

    def totalVolume(dir: String): Double =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"),
          min("u").as("u0"), max("u").as("u1"))
        .select(((col("x1") - col("x0")) * (col("y1") - col("y0")) * (col("u1") - col("u0"))).as("v"))
        .as[Double].collect().sum

    val (zVol, hVol) = (totalVolume(s"$root/z"), totalVolume(s"$root/h"))
    assert(hVol < zVol,
      f"hilbert total bbox volume $hVol%.4f should undercut z-order's $zVol%.4f")
  }

  test("z-ordered files prune on BOTH dimensions; a 1-D sort cannot") {
    val n = 100000
    val df = uniformCols(n, "x" -> 7, "y" -> 13)
    val bounds = Layout.linearBoundaries(0.0, 1.0, 3) // 8x8 grid
    val root = s"target/tmp/layout_${System.nanoTime()}"
    Layout.writeZOrdered(df, Seq("x" -> bounds, "y" -> bounds), s"$root/z", numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$root/xsort")

    def filesTouched(dir: String, xr: Option[(Double, Double)], yr: Option[(Double, Double)]): Long = {
      val boxes = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      val survivesX = xr.map { case (lo, hi) => !(col("x1") < lo || col("x0") > hi) }.getOrElse(lit(true))
      val survivesY = yr.map { case (lo, hi) => !(col("y1") < lo || col("y0") > hi) }.getOrElse(lit(true))
      boxes.filter(survivesX && survivesY).count()
    }

    // y-selective predicate: the x-sorted layout has no y locality at
    // all — every file's y range spans [0,1] and none prune. The z
    // layout keeps y ranges narrow, so most files skip.
    val yBand = Some((0.40, 0.45))
    val zTouchedY = filesTouched(s"$root/z", None, yBand)
    val xTouchedY = filesTouched(s"$root/xsort", None, yBand)
    assert(xTouchedY == 16L, s"1-D layout should scan everything, touched $xTouchedY")
    assert(zTouchedY <= 8L, s"z layout should skip most files, touched $zTouchedY")

    // ...while staying competitive on the dimension the 1-D sort owns.
    val xBand = Some((0.40, 0.45))
    val zTouchedX = filesTouched(s"$root/z", xBand, None)
    assert(zTouchedX <= 8L, s"z layout x-pruning, touched $zTouchedX")

    // 2-D box: intersection prunes harder than either band.
    val zTouchedBox = filesTouched(s"$root/z", xBand, yBand)
    assert(zTouchedBox <= zTouchedY && zTouchedBox <= zTouchedX)
    assert(zTouchedBox <= 4L, s"2-D box should touch a handful of files, got $zTouchedBox")
  }
}
