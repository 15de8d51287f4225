package graft

import org.apache.spark.sql.functions._

import graft.operators.Anomaly

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // 20 well-behaved points around 10 plus one gross outlier per group.
  private lazy val fixture = {
    val a = (1 to 20).map(i => ("a", i.toLong, 10.0 + (i % 5) * 0.1)) :+ (("a", 99L, 500.0))
    val b = (1 to 20).map(i => ("b", 100L + i, 20.0 + (i % 3) * 0.2)) :+ (("b", 199L, -300.0))
    (a ++ b).toDF("grp", "id", "v")
  }

  test("robust z flags the planted outlier and nothing in the bulk") {
    val scored = Anomaly.robustZScore(fixture, "grp", "v")
    val outliers = scored.filter(col("is_outlier")).select("id").as[Long].collect().toSet
    assert(outliers == Set(99L, 199L))
    // Robustness: the outlier barely moves the baseline — median stays in
    // the bulk for every group.
    val meds = scored.select("grp", "med").distinct().as[(String, Double)].collect().toMap
    assert(meds("a") >= 10.0 && meds("a") <= 10.5)
    assert(meds("b") >= 20.0 && meds("b") <= 20.5)
  }

  test("MAD = 0 (constant-majority group) yields null scores, not a blowup") {
    val const = (1 to 10).map(i => ("c", i.toLong, 7.0)) :+ (("c", 99L, 1000.0))
    val scored = Anomaly.robustZScore(const.toDF("grp", "id", "v"), "grp", "v")
    // Majority constant -> median 7, MAD 0: all scores null, no outliers
    // flagged (the score is undefined, not infinite).
    assert(scored.filter(col("robust_z").isNotNull).count() == 0)
    assert(scored.filter(col("is_outlier")).count() == 0)
  }

  test("approximate percentile path agrees with exact on modest groups") {
    val exact = Anomaly.robustZScore(fixture, "grp", "v", exact = true)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    val approx = Anomaly.robustZScore(fixture, "grp", "v", exact = false)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(approx == exact)
  }

  test("seasonal robust z: anomalous-for-the-hour, invisible to the whole-group score") {
    // 3 AM runs hot (~100), noon runs cold (~5). A noon value of 50 sits
    // BETWEEN the two modes — the whole-group baseline can't flag it —
    // but is wildly anomalous for noon.
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2023-01-01 $h%02d:$m%02d:00")
    val rows =
      (1 to 20).map(i => (i.toLong, "pay", ts(3, i), 100.0 + (i % 5) * 0.5)) ++
        (1 to 20).map(i => (100L + i, "pay", ts(12, i), 5.0 + (i % 5) * 0.1)) :+
        ((999L, "pay", ts(12, 30), 50.0))
    val df = rows.toDF("event_id", "event_type", "ts", "value")
    val seasonal = Anomaly.seasonalRobustZ(df, "event_type", "ts", "value")
    val flagged = seasonal.filter(col("is_outlier"))
      .select("event_id").as[Long].collect().toSet
    assert(flagged == Set(999L), s"only the noon-anomalous row: $flagged")
    // The whole-group score is blind to it (50 sits between the modes).
    val plain = Anomaly.robustZScore(df, "event_type", "value")
      .filter(col("event_id") === 999L && col("is_outlier")).count()
    assert(plain == 0L, "the all-day baseline must NOT flag the in-between value")
    // season_bucket names the baseline; dow/how bucket correctly too.
    val buckets = seasonal.select("event_id", "season_bucket")
      .as[(Long, Int)].collect().toMap
    assert(buckets(1L) == 3 && buckets(101L) == 12)
    val how = Anomaly.seasonalRobustZ(df, "event_type", "ts", "value", season = "how")
      .select("season_bucket").distinct().as[Int].collect().toSet
    // 2023-01-01 is a Sunday: dayofweek = 1, so hour-of-week = hour.
    assert(how == Set(3, 12))
    val err = intercept[IllegalArgumentException] {
      Anomaly.seasonalRobustZ(df, "event_type", "ts", "value", season = "nope")
    }
    assert(err.getMessage.contains("hod, dow, how"))
  }

  test("frozen baseline: a burst cannot mask itself; missing groups score null") {
    // Clean history: tight around 10. Serving batch: a 40%-of-rows
    // burst at 100 — self-scoring stats absorb the burst (median/MAD
    // shift/widen enough that nothing flags reliably... MAD with 40%
    // contamination still holds here, so make the contrast sharper: a
    // MAJORITY burst, 60%), while the FROZEN baseline flags every
    // burst row.
    val history = (1 to 20).map(i => ("g", i.toLong, 10.0 + (i % 5) * 0.1))
      .toDF("grp", "id", "v")
    val serving = ((1 to 4).map(i => ("g", 100L + i, 10.0 + (i % 5) * 0.1)) ++
      (1 to 6).map(i => ("g", 200L + i, 100.0 + i * 0.01)))
      .toDF("grp", "id", "v")
    val frozen = Anomaly.robustStats(history, "grp", "v")
    val scored = Anomaly.scoreAgainstStats(serving, "grp", "v", frozen)
    val flagged = scored.filter(col("is_outlier")).select("id").as[Long].collect().toSet
    assert(flagged == (1 to 6).map(200L + _).toSet,
      s"frozen baseline flags exactly the burst: $flagged")
    // Self-scoring the same serving batch: the majority burst OWNS the
    // median — the clean rows get flagged instead. The failure mode the
    // frozen split exists to prevent.
    val selfFlagged = Anomaly.robustZScore(serving, "grp", "v")
      .filter(col("is_outlier")).select("id").as[Long].collect().toSet
    assert(!selfFlagged.exists(_ > 200L),
      s"self-stats are owned by the burst: $selfFlagged")
    // A group absent from the baseline: no verdict, never a crash.
    val alien = Seq(("other", 999L, 5.0)).toDF("grp", "id", "v")
    val row = Anomaly.scoreAgainstStats(alien, "grp", "v", frozen).collect().head
    assert(row.isNullAt(row.fieldIndex("robust_z")))
    assert(!row.getBoolean(row.fieldIndex("is_outlier")))
  }

  test("IQR fences flag the planted outliers and respect the k factor") {
    val flagged = Anomaly.iqrOutliers(fixture, "grp", "v")
      .filter(col("is_outlier")).select("id").as[Long].collect().toSet
    assert(flagged == Set(99L, 199L))
    // A huge k widens the fences past everything.
    val none = Anomaly.iqrOutliers(fixture, "grp", "v", k = 1e6)
      .filter(col("is_outlier")).count()
    assert(none == 0)
  }
}
