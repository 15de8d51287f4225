package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    // key, value, tag
    ("a", 10.11, 1), ("a", 2.39, 0), ("a", 7.50, 1),
    ("b", 100.01, 0), ("b", 0.99, 1),
    ("c", 42.42, 0)
  ).toDF("k", "v", "tag")

  private def state(df: DataFrame) = IncrementalAgg.partialState(
    df, Seq("k"),
    sums = Seq("sv" -> col("v").cast("decimal(18,2)"), "st" -> col("tag")),
    mins = Seq("mn" -> col("v")), maxs = Seq("mx" -> col("v")))

  private def mergeS(a: DataFrame, b: DataFrame) = IncrementalAgg.merge(
    a, b, Seq("k"), sumCols = Seq("sv", "st"), minCols = Seq("mn"), maxCols = Seq("mx"))

  private def canon(df: DataFrame): Seq[(String, Long, Double, Long, Double, Double)] =
    df.select(col("k"), col("n"), col("sv").cast("double"), col("st"),
      col("mn"), col("mx"))
      .as[(String, Long, Double, Long, Double, Double)]
      .collect().sortBy(_._1).toSeq

  test("merged split states equal the direct full aggregation, any split") {
    val direct = canon(state(rows))
    for (splitTag <- Seq(0, 1)) {
      val merged = mergeS(
        state(rows.filter(col("tag") === splitTag)),
        state(rows.filter(col("tag") =!= splitTag)))
      assert(canon(merged) == direct, s"split on tag=$splitTag")
    }
  }

  test("chained merges (one delta at a time) converge to the direct state") {
    val parts = Seq(
      rows.filter(col("v") < 5), rows.filter(col("v") >= 5 && col("v") < 50),
      rows.filter(col("v") >= 50))
    val folded = parts.map(state).reduce(mergeS)
    assert(canon(folded) == canon(state(rows)))
  }

  test("merging an empty delta is a no-op") {
    val merged = mergeS(state(rows), state(rows.filter(lit(false))))
    assert(canon(merged) == canon(state(rows)))
  }

  test("keys only in the delta appear; keys only in state survive") {
    val s0 = state(rows.filter(col("k") =!= "c"))
    val d0 = state(rows.filter(col("k") === "c"))
    val merged = canon(mergeS(s0, d0))
    assert(merged.map(_._1) == Seq("a", "b", "c"))
    assert(merged == canon(state(rows)))
  }
}
