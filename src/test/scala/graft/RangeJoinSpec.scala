package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Numeric ranges exercise the pass-through epoch path; binWidth 10
  // forces multi-bin intervals (len up to 35).
  private lazy val points = Seq(
    (1L, 0.0), (2L, 5.0), (3L, 10.0), (4L, 17.0), (5L, 30.0), (6L, 99.0)
  ).toDF("p_id", "p_x")

  private lazy val intervals = Seq(
    (10L, 0.0, 10.0),   // [0,10): points 1,2
    (11L, 5.0, 40.0),   // [5,40): points 2,3,4,5 — spans 4 bins
    (12L, 17.0, 17.0),  // empty half-open interval: nothing
    (13L, 95.0, 105.0)  // [95,105): point 6
  ).toDF("i_id", "i_start", "i_end")

  private def naivePairs(endInclusive: Boolean): Set[(Long, Long)] = {
    val cond = if (endInclusive)
      col("p_x") >= col("i_start") && col("p_x") <= col("i_end")
    else
      col("p_x") >= col("i_start") && col("p_x") < col("i_end")
    points.crossJoin(intervals).filter(cond)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
  }

  test("pointInInterval matches the naive inequality join, each pair once") {
    val got = RangeJoin.pointInInterval(
      points, intervals, "p_x", "i_start", "i_end", binWidth = 10.0)
      .select("p_id", "i_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "no duplicate pairs")
    assert(got.toSet == naivePairs(endInclusive = false))
    // boundary semantics baked into the fixture: 3 is in [5,40) not [0,10)
    assert(got.toSet.contains((3L, 11L)) && !got.toSet.contains((3L, 10L)))
  }

  test("endInclusive widens the boundary to closed intervals") {
    val got = RangeJoin.pointInInterval(
      points, intervals, "p_x", "i_start", "i_end", binWidth = 10.0,
      endInclusive = true)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == naivePairs(endInclusive = true))
    assert(got.contains((3L, 10L)), "point at end now matches")
    assert(got.contains((4L, 12L)), "degenerate [x,x] matches its point")
  }

  test("equiKeys restrict matches within key, same containment semantics") {
    val kp = points.withColumn("p_k", (col("p_id") % 2).cast("int"))
    val ki = intervals.withColumn("i_k", (col("i_id") % 2).cast("int"))
    val got = RangeJoin.pointInInterval(
      kp, ki, "p_x", "i_start", "i_end", binWidth = 10.0,
      equiKeys = Seq("p_k" -> "i_k"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    val want = kp.crossJoin(ki)
      .filter(col("p_x") >= col("i_start") && col("p_x") < col("i_end") &&
        col("p_k") === col("i_k"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("temporal columns go through epoch seconds") {
    val p = Seq((1L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00")))
      .toDF("p_id", "p_ts")
    val i = Seq(
      (10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-08 00:00:00")),
      (11L, java.sql.Timestamp.valueOf("2024-01-06 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-09 00:00:00")))
      .toDF("i_id", "i_s", "i_e")
    val got = RangeJoin.pointInInterval(
      p, i, "p_ts", "i_s", "i_e", binWidth = 86400.0 * 7)
      .select("i_id").as[Long].collect().toSet
    assert(got == Set(10L))
  }

  test("intervalOverlap matches the naive overlap join, each pair once") {
    val l = Seq(
      (1L, 0.0, 10.0), (2L, 5.0, 40.0), (3L, 50.0, 60.0), (4L, 70.0, 70.0)
    ).toDF("l_id", "l_s", "l_e")
    val r = Seq(
      (10L, 8.0, 12.0),   // overlaps 1 and 2
      (11L, 10.0, 50.0),  // touches 1 (no), overlaps 2; touches 3 (no)
      (12L, 55.0, 58.0),  // inside 3
      (13L, 70.0, 75.0)   // touches empty 4: no overlap
    ).toDF("r_id", "r_s", "r_e")
    val got = RangeJoin.intervalOverlap(
      l, r, "l_s", "l_e", "r_s", "r_e", binWidth = 10.0)
      .select("l_id", "r_id").as[(Long, Long)].collect()
    val want = l.crossJoin(r)
      .filter(col("l_s") < col("r_e") && col("r_s") < col("l_e"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got.length == got.toSet.size, "no duplicate pairs")
    assert(got.toSet == want)
    assert(!got.toSet.contains((1L, 11L)), "touching endpoints do not overlap")
    // (2,11) share bins 1..4 — emitted exactly once via the first-shared-bin rule
    assert(got.count(_ == (2L, 11L)) == 1)
  }
}
