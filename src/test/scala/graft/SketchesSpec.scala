package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 12k rows, ~2k distinct users spread over 3 groups — large enough to
  // push the lgK=12 sketch through its coupon-list phase in at least one
  // group, so the merge identity is tested in estimation mode too.
  private lazy val events: DataFrame = spark.range(12000)
    .select(
      (col("id") % 3).cast("string").as("g"),
      (hash(col("id")) % 2000).as("user"),
      (col("id") % 7).as("day"))

  private def direct = Sketches.hllState(events, Seq("g"), "user")

  private def est(df: DataFrame): Map[String, Long] =
    Sketches.hllEstimate(df, "est").select("g", "est")
      .as[(String, Long)].collect().toMap

  test("union of split sketches equals the sketch of the union, any split") {
    val whole = est(direct)
    for (splitDay <- Seq(1L, 3L, 6L)) {
      val merged = Sketches.hllMerge(
        Sketches.hllState(events.filter(col("day") < splitDay), Seq("g"), "user"),
        Sketches.hllState(events.filter(col("day") >= splitDay), Seq("g"), "user"),
        Seq("g"))
      assert(est(merged) == whole, s"split at day $splitDay")
    }
  }

  test("chained per-day merges converge to the direct sketch") {
    val days = (0L to 6L).map(dy =>
      Sketches.hllState(events.filter(col("day") === dy), Seq("g"), "user"))
    val folded = days.reduce(Sketches.hllMerge(_, _, Seq("g")))
    assert(est(folded) == est(direct))
  }

  test("estimates track exact distinct counts within the HLL bound") {
    val exact = events.groupBy("g").agg(countDistinct(col("user")).as("n"))
      .as[(String, Long)].collect().toMap
    val approx = est(direct)
    assert(approx.keySet == exact.keySet)
    for ((g, n) <- exact) {
      val e = approx(g)
      assert(math.abs(e - n).toDouble / n < 0.05, s"group $g: est $e vs exact $n")
    }
  }

  test("keys only in the delta appear after a merge") {
    val s0 = Sketches.hllState(events.filter(col("g") =!= "2"), Seq("g"), "user")
    val d0 = Sketches.hllState(events.filter(col("g") === "2"), Seq("g"), "user")
    val merged = est(Sketches.hllMerge(s0, d0, Seq("g")))
    assert(merged.keySet == Set("0", "1", "2"))
    assert(merged == est(direct))
  }
}
