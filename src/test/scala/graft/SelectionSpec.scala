package graft

import org.apache.spark.sql.functions._

import graft.operators.Selection

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("kthSmallest matches the sorted reference across ranks, with duplicates") {
    val rng = new scala.util.Random(42)
    // Heavy duplicates + spread: the all-equal-bucket exit and the
    // histogram routing both get exercised.
    val vals = Seq.fill(5000)(rng.nextInt(300).toDouble) ++
      Seq.fill(500)(rng.nextDouble() * 1e9) ++ Seq.fill(200)(7.0)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    for (k <- Seq(1, 2, 57, 700, 2849, 5000, vals.size)) {
      val got = Selection.kthSmallest(df, "v", k, tailThreshold = 64)
      assert(got == sorted(k - 1), s"k=$k")
    }
  }

  test("kthSmallest on a tiny tail goes straight to TakeOrdered") {
    val df = Seq(5.0, 1.0, 3.0, 2.0, 4.0).toDF("v")
    assert(Selection.kthSmallest(df, "v", 3) == 3.0)
    assert(Selection.kthSmallest(df, "v", 1) == 1.0)
    assert(Selection.kthSmallest(df, "v", 5) == 5.0)
  }

  test("nulls are ignored; NaN tail ranks return NaN; all-equal column returns the value") {
    val df = Seq(Some(2.0), None, Some(1.0), Some(Double.NaN), Some(3.0)).toDF("v")
    assert(Selection.kthSmallest(df, "v", 3) == 3.0) // nulls excluded
    assert(Selection.kthSmallest(df, "v", 4).isNaN)  // NaN after +inf
    intercept[IllegalArgumentException] { Selection.kthSmallest(df, "v", 5) }
    val same = Seq.fill(100000)(42.0).toDF("v")
    assert(Selection.kthSmallest(same, "v", 99999, tailThreshold = 10) == 42.0)
  }

  test("long columns route correctly through the monotone double cast") {
    val df = (1L to 100000L).toDF("v")
    assert(Selection.kthSmallest(df, "v", 12345, tailThreshold = 100) == 12345.0)
    assert(Selection.quantileDisc(df, "v", 0.5) == 50000.0)
    assert(Selection.quantileDisc(df, "v", 0.0) == 1.0)
    assert(Selection.quantileDisc(df, "v", 1.0) == 100000.0)
  }

  test("quantileDisc uses the lower-nearest-rank definition") {
    val df = Seq(10.0, 20.0, 30.0, 40.0).toDF("v")
    assert(Selection.quantileDisc(df, "v", 0.5) == 20.0)  // floor(0.5*3)+1 = rank 2
    assert(Selection.quantileDisc(df, "v", 0.75) == 30.0) // floor(.75*3)+1 = rank 3
  }
}
