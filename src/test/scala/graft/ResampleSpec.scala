package graft

import graft.operators.Resample

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // Observations at 00:30 (v=10), 02:30 (v=30), 03:00 (v=50):
  // hourly grid = 01:00, 02:00, 03:00.
  private def series = Seq(
    ("a", ts("2024-01-01 00:30:00"), 10.0),
    ("a", ts("2024-01-01 02:30:00"), 30.0),
    ("a", ts("2024-01-01 03:00:00"), 50.0)
  ).toDF("g", "ts", "v")

  test("toGrid locf: carries the last observation, grid stays in range") {
    val got = Resample.toGrid(series, "g", "ts", "v", 3600L, "locf")
      .orderBy("grid_ts_sec").as[(String, Long, Double)].collect().toSeq
    // 01:00 and 02:00 carry 10.0 (last obs 00:30); 03:00 hits the
    // observation exactly and takes it.
    assert(got.map(_._3) == Seq(10.0, 10.0, 50.0))
    assert(got.map(_._2) == got.map(_._2).sorted)
    assert(got.size == 3, "no tick before the first or after the last obs")
  }

  test("toGrid interp: blends between straddling observations") {
    val got = Resample.toGrid(series, "g", "ts", "v", 3600L, "interp")
      .orderBy("grid_ts_sec").as[(String, Long, Double)].collect().toSeq
    // 01:00 is 30/120 of the way from 00:30(10) to 02:30(30) -> 15;
    // 02:00 is 90/120 -> 25; 03:00 coincides with an obs -> 50.
    assert(got.map(_._3) == Seq(15.0, 25.0, 50.0))
  }

  test("toGrid: same-instant duplicates collapse to their mean first") {
    val dup = Seq(
      ("a", ts("2024-01-01 00:00:00"), 10.0),
      ("a", ts("2024-01-01 00:00:00"), 20.0),
      ("a", ts("2024-01-01 01:00:00"), 40.0)
    ).toDF("g", "ts", "v")
    val got = Resample.toGrid(dup, "g", "ts", "v", 3600L, "locf")
      .orderBy("grid_ts_sec").select("value").as[Double].collect().toSeq
    assert(got == Seq(15.0, 40.0))
  }

  test("toGrid: a group spanning less than one step emits nothing") {
    val tiny = Seq(("a", ts("2024-01-01 00:10:00"), 1.0),
      ("a", ts("2024-01-01 00:20:00"), 2.0)).toDF("g", "ts", "v")
    assert(Resample.toGrid(tiny, "g", "ts", "v", 3600L, "locf").count() == 0)
    // ...unless an aligned tick falls inside the observed range.
    val ok = Seq(("a", ts("2024-01-01 00:50:00"), 1.0),
      ("a", ts("2024-01-01 01:10:00"), 2.0)).toDF("g", "ts", "v")
    val got = Resample.toGrid(ok, "g", "ts", "v", 3600L, "interp")
      .as[(String, Long, Double)].collect().toSeq
    // 01:00 is 10/20 of the way from 1.0 to 2.0.
    assert(got.map(_._3) == Seq(1.5))
  }

  test("twap: LOCF integral over the span, chatty periods not over-weighted") {
    // v=10 holds for 2h, v=30 for 30min, last obs closes the span:
    // twap = (10*7200 + 30*1800) / 9000 = 14.0; the plain mean is 30.
    val got = Resample.twap(series, "g", "ts", "v").collect().head
    assert(got.getLong(1) == 3L)
    assert(got.getDouble(2) == 14.0)
    // Burst of samples at one value must not drag the time average:
    // v=0 for 1h, then 100 sampled 5x within the final second.
    val bursty = (Seq(("b", ts("2024-01-01 00:00:00"), 0.0)) ++
      (0 to 4).map(i => ("b", ts(s"2024-01-01 01:00:0$i"), 100.0)))
      .toDF("g", "ts", "v")
    val b = Resample.twap(bursty, "g", "ts", "v").collect().head
    // integral = 0*3600s + 100*4s over span 3604s ~ 0.111
    assert(b.getDouble(2) == math.rint(100.0 * 4 / 3604 * 1e6) / 1e6)
    // Same-instant duplicates collapse to their mean before weighting;
    // single-instant groups have no span -> null.
    val dup = Seq(("c", ts("2024-01-01 00:00:00"), 1.0),
      ("c", ts("2024-01-01 00:00:00"), 3.0),
      ("c", ts("2024-01-01 01:00:00"), 2.0),
      ("solo", ts("2024-01-01 00:00:00"), 9.0)).toDF("g", "ts", "v")
    val rows = Resample.twap(dup, "g", "ts", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("c").getDouble(2) == 2.0) // mean(1,3)=2 held for the whole hour
    assert(rows("solo").isNullAt(2) && rows("solo").getLong(1) == 1L)
  }
}
