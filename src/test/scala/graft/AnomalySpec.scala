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

  // Daily series fixture: 10 flat days at 10.0, then 10 days shifted to
  // 10.5 — a small persistent shift (under any 3-sigma point test) that
  // EWMA/CUSUM exist to catch.
  private def shiftSeries: org.apache.spark.sql.DataFrame = {
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2023-01-${i}%02d 12:00:00")
    ((1 to 10).map(i => ("pay", day(i), 10.0)) ++
      (11 to 20).map(i => ("pay", day(i), 10.5)))
      .toDF("grp", "ts", "v")
  }

  test("ewmaChart: recursion matches the closed form and alarms on the shift") {
    val out = Anomaly.ewmaChart(shiftSeries, "grp", "ts", "v", alpha = 0.3)
      .orderBy("day").collect()
    assert(out.length == 20)
    // Hand-rolled recursion with the same per-step 6dp rounding.
    var z = 10.0
    out.zipWithIndex.foreach { case (r, i) =>
      val m = r.getDouble(r.fieldIndex("m"))
      if (i == 0) z = m
      else z = BigDecimal(0.3 * m + 0.7 * z)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(r.fieldIndex("ewma")) - z) < 1e-9,
        s"day $i ewma ${r.getDouble(r.fieldIndex("ewma"))} != $z")
    }
    // First day has no previous baseline -> no innovation, no alarm.
    assert(out.head.isNullAt(out.head.fieldIndex("innovation")))
    assert(!out.head.getBoolean(out.head.fieldIndex("is_alarm")))
    // The shift day's innovation is the full step |10.5 - z_10 = 10.0|.
    val d11 = out(10)
    assert(math.abs(d11.getDouble(d11.fieldIndex("innovation")) - 0.5) < 1e-9)
    assert(d11.getBoolean(d11.fieldIndex("is_alarm")),
      "the 0.5 step must clear the EWMA control limit")
  }

  test("holtForecast: tracks a steady ramp silently, alarms on a level break") {
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2023-01-${i}%02d 12:00:00")
    // 20 days of a clean linear ramp (+2/day), then a day that breaks it.
    val ramp = (1 to 20).map(i => ("pay", day(i), 10.0 + 2.0 * i)) :+
      (("pay", day(21), 200.0))
    val out = Anomaly.holtForecast(ramp.toDF("grp", "ts", "v"), "grp", "ts", "v",
        alpha = 0.5, beta = 0.5)
      .orderBy("day").collect()
    // Replay the recursion by hand (6dp per step, two-point trend seed).
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var l = 12.0; var b = 2.0 // l1 = m1 = 12, b1 = m2 - m1 = 2
    out.zipWithIndex.drop(1).foreach { case (row, i) =>
      val m = row.getDouble(row.fieldIndex("m"))
      val lNew = r6(0.5 * m + 0.5 * (l + b))
      b = r6(0.5 * (lNew - l) + 0.5 * b); l = lNew
      assert(math.abs(row.getDouble(row.fieldIndex("level")) - l) < 1e-9,
        s"day $i level")
      assert(math.abs(row.getDouble(row.fieldIndex("trend")) - b) < 1e-9,
        s"day $i trend")
    }
    // On the clean ramp the forecast is exact (error 0) from day 3 on —
    // the trend-adjusted chart stays silent where EWMA would page daily.
    val rampErrs = out.slice(2, 20).map(r => r.getDouble(r.fieldIndex("error")))
    assert(rampErrs.forall(e => math.abs(e) < 1e-6), rampErrs.mkString(","))
    val last = out.last
    assert(last.getBoolean(last.fieldIndex("is_alarm")), "the break must alarm")
    assert(out.slice(2, 20).forall(r => !r.getBoolean(r.fieldIndex("is_alarm"))))
    // Degenerate single-day group: zero trend seed, null sigma, no alarm.
    val one = Anomaly.holtForecast(
      Seq(("solo", day(1), 5.0)).toDF("grp", "ts", "v"), "grp", "ts", "v").collect().head
    assert(one.getDouble(one.fieldIndex("trend")) == 0.0)
    assert(one.isNullAt(one.fieldIndex("sigma_e")))
    assert(!one.getBoolean(one.fieldIndex("is_alarm")))
  }

  test("changePointScan: finds the planted shift day exactly") {
    val cp = Anomaly.changePointScan(shiftSeries, "grp", "ts", "v").collect().head
    assert(cp.getDate(cp.fieldIndex("change_day")).toString == "2023-01-10",
      s"argmax split must be the last pre-shift day: $cp")
    assert(math.abs(cp.getDouble(cp.fieldIndex("mean_before")) - 10.0) < 1e-9)
    assert(math.abs(cp.getDouble(cp.fieldIndex("mean_after")) - 10.5) < 1e-9)
  }

  test("seasonalDecompose: recovers a planted weekly rhythm on a linear trend") {
    // 35 days: value = 2*dayIndex (trend) + a day-of-week bump of +50 on
    // one weekday. The decomposition must put the ramp in trend, the
    // bump in seasonal, and leave residuals ~0.
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2023, 1, 1).plusDays(i - 1).atTime(12, 0))
    val rows = (1 to 35).map { i =>
      val bump = if ((i - 1) % 7 == 0) 50.0 else 0.0
      ("g", day(i), 2.0 * i + bump)
    }
    val out = Anomaly.seasonalDecompose(rows.toDF("grp", "ts", "v"), "grp", "ts", "v")
      .orderBy("day").collect()
    // Edges (first/last 3 days) have no full window -> null trend/residual.
    assert(out.take(3).forall(_.isNullAt(out.head.fieldIndex("trend"))))
    assert(out.takeRight(3).forall(_.isNullAt(out.head.fieldIndex("trend"))))
    // The bump day's seasonal component dominates every other weekday's.
    val seasonalByDow = out.map(r =>
      r.getInt(r.fieldIndex("dow")) -> r.getDouble(r.fieldIndex("seasonal"))).toMap
    val bumpDow = out.head.getInt(out.head.fieldIndex("dow")) // day 1 is the bump day
    assert(seasonalByDow(bumpDow) > 35.0,
      s"bump weekday seasonal: ${seasonalByDow(bumpDow)}")
    assert(seasonalByDow.filter(_._1 != bumpDow).values.forall(_ < 0),
      "other weekdays absorb the negative complement")
    // Residuals on interior days are small (the MA smears the bump a
    // little — 50/7 ≈ 7 of it rides the trend — but nothing like the
    // raw bump).
    val resid = out.filter(!_.isNullAt(out.head.fieldIndex("residual")))
      .map(r => math.abs(r.getDouble(r.fieldIndex("residual"))))
    assert(resid.max < 10.0, s"max residual ${resid.max}")
  }

  test("autocorrelation: period-7 signal spikes at lag 7, noise-free ramp at lag 1") {
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2023, 1, 1).plusDays(i - 1).atTime(12, 0))
    // Pure 7-day square wave: ACF at lag 7 is exactly 1.
    val weekly = (1 to 42).map(i => ("w", day(i), if ((i - 1) % 7 < 3) 10.0 else 20.0))
    val acf = Anomaly.autocorrelation(weekly.toDF("grp", "ts", "v"), "grp", "ts", "v")
      .select("lag", "acf").as[(Int, Double)].collect().toMap
    assert(math.abs(acf(7) - 1.0) < 1e-9, s"lag-7 acf: ${acf(7)}")
    assert(acf(1) < acf(7), "off-period lags correlate less")
    // Constant series: zero variance -> null acf, never a divide blowup.
    val const = (1 to 20).map(i => ("c", day(i), 5.0))
    val gotNull = Anomaly.autocorrelation(const.toDF("grp", "ts", "v"), "grp", "ts", "v")
      .filter(col("acf").isNotNull).count()
    assert(gotNull == 0)
  }

  test("ksDrift: identical slices score 0, disjoint slices score 1") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2023-01-${d}%02d 00:00:00")
    val same = ((1 to 15) ++ (16 to 28)).flatMap(d =>
      (1 to 30).map(i => ("a", ts(d), i.toDouble))).toDF("grp", "ts", "v")
    val k0 = Anomaly.ksDrift(same, "grp", "v", dayofmonth(col("ts")) <= 15)
      .select("ks_d").as[Double].collect().head
    assert(k0 == 0.0)
    val disjoint = ((1 to 15).flatMap(d => (1 to 30).map(i => ("a", ts(d), i.toDouble))) ++
      (16 to 28).flatMap(d => (1 to 30).map(i => ("a", ts(d), 1000.0 + i)))).toDF("grp", "ts", "v")
    val k1 = Anomaly.ksDrift(disjoint, "grp", "v", dayofmonth(col("ts")) <= 15)
      .select("ks_d").as[Double].collect().head
    assert(k1 == 1.0)
    // A mid-range shift lands strictly between.
    val shifted = ((1 to 15).flatMap(d => (1 to 30).map(i => ("a", ts(d), i.toDouble))) ++
      (16 to 28).flatMap(d => (1 to 30).map(i => ("a", ts(d), i + 10.0)))).toDF("grp", "ts", "v")
    val km = Anomaly.ksDrift(shifted, "grp", "v", dayofmonth(col("ts")) <= 15)
      .select("ks_d").as[Double].collect().head
    assert(km > 0.2 && km < 1.0, s"partial shift: $km")
  }

  test("psiDrift: identical halves score ~0, a shifted half scores big") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2023-01-${d}%02d 00:00:00")
    // Baseline days 1-15 and current days 16-28 drawn from the same
    // deterministic ramp -> PSI ~ 0.
    val same = ((1 to 15).flatMap(d => (1 to 20).map(i => ("a", ts(d), i.toDouble))) ++
      (16 to 28).flatMap(d => (1 to 20).map(i => ("a", ts(d), i.toDouble))))
      .toDF("grp", "ts", "v")
    val psiSame = Anomaly.psiDrift(same, "grp", "v", dayofmonth(col("ts")) <= 15)
      .select("psi").distinct().as[Double].collect().head
    assert(psiSame < 0.01, s"identical distributions must be stable: $psiSame")
    // Current half shifted by +100 -> every row lands in the top bucket.
    val shifted = ((1 to 15).flatMap(d => (1 to 20).map(i => ("a", ts(d), i.toDouble))) ++
      (16 to 28).flatMap(d => (1 to 20).map(i => ("a", ts(d), i + 100.0))))
      .toDF("grp", "ts", "v")
    val psiShift = Anomaly.psiDrift(shifted, "grp", "v", dayofmonth(col("ts")) <= 15)
      .select("psi").distinct().as[Double].collect().head
    assert(psiShift > 0.25, s"wholesale shift must clear the action gate: $psiShift")
    // Bucket contributions sum to the reported PSI.
    val rows = Anomaly.psiDrift(shifted, "grp", "v", dayofmonth(col("ts")) <= 15)
      .agg(sum(col("contrib")), max(col("psi"))).as[(Double, Double)].collect().head
    assert(math.abs(rows._1 - rows._2) < 1e-5)
  }

  test("psiBaseline + psiAgainstBaseline == one-shot psiDrift, and the baseline is frozen") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2023-01-${d}%02d 00:00:00")
    val df = ((1 to 15).flatMap(d => (1 to 20).map(i => ("a", ts(d), i.toDouble))) ++
      (16 to 28).flatMap(d => (1 to 20).map(i => ("a", ts(d), i + 5.0))))
      .toDF("grp", "ts", "v")
    val isBase = dayofmonth(col("ts")) <= 15
    val oneShot = Anomaly.psiDrift(df, "grp", "v", isBase)
      .orderBy("grp", "bucket").collect().toSeq
    val frozen = Anomaly.psiBaseline(df.filter(isBase), "grp", "v")
    val split = Anomaly.psiAgainstBaseline(df.filter(!isBase), "grp", "v", frozen)
      .orderBy("grp", "bucket").collect().toSeq
    assert(split == oneShot, "fit+score must equal the one-shot drift exactly")
    // Frozen means frozen: scoring a wildly drifted second batch reuses
    // the SAME edges — its PSI is computed against the original
    // baseline, not a re-fit that would absorb the drift.
    val drifted = (1 to 200).map(i => ("a", ts(20), 1000.0 + i)).toDF("grp", "ts", "v")
    val psi2 = Anomaly.psiAgainstBaseline(drifted, "grp", "v", frozen)
      .select("psi").distinct().as[Double].collect().head
    assert(psi2 > 1.0, s"total drift against the frozen edges: $psi2")
  }

  test("benfordDeviation: Benford-ish data scores low, digit-stuffed data high") {
    // Geometric spread (scale-free) approximates Benford; values in cents.
    val natural = (0 until 400).map { i =>
      ("nat", math.pow(1.03, i) % 1e6 + 1.0)
    }.toDF("grp", "v")
    // Fabricated: everything starts with digit 5.
    val stuffed = (0 until 400).map(i => ("fab", 500.0 + (i % 90))).toDF("grp", "v")
    val both = natural.union(stuffed)
    val chi = Anomaly.benfordDeviation(both, "grp", "v")
      .select("grp", "chi2").distinct().as[(String, Double)].collect().toMap
    assert(chi("fab") > chi("nat") * 5,
      s"digit stuffing must dominate: $chi")
    // Shares sum to 1 per group; expected shares are the Benford law.
    val shares = Anomaly.benfordDeviation(both, "grp", "v")
      .groupBy("grp").agg(sum(col("obs_frac")), sum(col("exp_frac")))
      .as[(String, Double, Double)].collect()
    shares.foreach { case (g, o, e) =>
      assert(math.abs(o - 1.0) < 1e-4, s"$g obs $o")
      assert(math.abs(e - 1.0) < 1e-4, s"$g exp $e")
    }
    // Zero and null values are excluded, never a leading digit of "0".
    val z = Seq(("z", 0.0), ("z", 123.45)).toDF("grp", "v")
    val digits = Anomaly.benfordDeviation(z, "grp", "v")
      .filter(col("n_d") > 0).select("digit").as[Int].collect().toSeq
    assert(digits == Seq(1))
  }

  test("holtWintersForecast: gamma=0 collapses exactly to holtForecast") {
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2023, 1, 1).plusDays(i - 1).atTime(12, 0))
    val noisy = (1 to 30).map(i =>
      ("g", day(i), 10.0 + 2.0 * i + (i % 5) * 3.0)).toDF("grp", "ts", "v")
    val hw = Anomaly.holtWintersForecast(noisy, "grp", "ts", "v",
        period = 7, alpha = 0.3, beta = 0.1, gamma = 0.0)
      .select("day", "level", "trend", "forecast", "error")
      .orderBy("day").collect().toSeq
    val h = Anomaly.holtForecast(noisy, "grp", "ts", "v",
        alpha = 0.3, beta = 0.1)
      .select("day", "level", "trend", "forecast", "error")
      .orderBy("day").collect().toSeq
    assert(hw == h, "zero seasonal weight must reproduce Holt bit-for-bit")
  }

  test("holtWintersForecast: learns a planted weekly rhythm Holt cannot") {
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2023, 1, 1).plusDays(i - 1).atTime(12, 0))
    // Pure 7-day cycle, no trend: +70 every 7th day, else 10.
    val cyc = (1 to 49).map(i =>
      ("g", day(i), if (i % 7 == 0) 80.0 else 10.0))
    val out = Anomaly.holtWintersForecast(cyc.toDF("grp", "ts", "v"),
        "grp", "ts", "v", period = 7, alpha = 0.2, beta = 0.05, gamma = 0.6)
      .orderBy("day").collect()
    def absErr(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(r.fieldIndex("error"))) 0.0
      else math.abs(r.getDouble(r.fieldIndex("error")))
    // Spike-day errors must SHRINK cycle over cycle as the seasonal
    // state absorbs the rhythm (Holt's would stay ~70 forever).
    val spikeErrs = out.zipWithIndex
      .filter { case (_, i) => (i + 1) % 7 == 0 && i > 0 }
      .map { case (r, _) => absErr(r) }
    assert(spikeErrs.length >= 6)
    assert(spikeErrs.last < spikeErrs.head / 3.0,
      s"seasonal state must absorb the spike: ${spikeErrs.mkString(",")}")
    // Degenerate one-day group.
    val one = Anomaly.holtWintersForecast(
      Seq(("solo", day(1), 5.0)).toDF("grp", "ts", "v"),
      "grp", "ts", "v").collect().head
    assert(one.getDouble(one.fieldIndex("trend")) == 0.0)
    assert(one.getDouble(one.fieldIndex("seasonal")) == 0.0)
    assert(one.isNullAt(one.fieldIndex("sigma_e")))
  }

  test("detectPeriod: planted weekly rhythm found, flat series not seasonal") {
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2023, 1, 1).plusDays(i - 1).atTime(12, 0))
    val df = ((1 to 56).map(i =>
      ("weekly", day(i), if (i % 7 == 0) 80.0 else 10.0)) ++
      // A clean linear ramp: raw ACF would scream "seasonal" at every
      // lag (trend autocorrelates near 1); the differenced detector
      // sees a constant -> zero variance -> NO period row at all.
      (1 to 56).map(i => ("ramp", day(i), 10.0 + 0.1 * i)))
      .toDF("grp", "ts", "v")
    val got = Anomaly.detectPeriod(df, "grp", "ts", "v",
        maxLag = 14, minAcf = 0.3)
      .collect().map(r => r.getString(0) ->
        (r.getInt(r.fieldIndex("period")),
          r.getBoolean(r.fieldIndex("is_seasonal")))).toMap
    assert(got("weekly") == (7, true), s"weekly rhythm: $got")
    assert(!got.contains("ramp"),
      s"a pure trend has no detectable season: $got")
  }

  test("rollingCorrelation: perfect lines at +-1, partial windows null") {
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2023-01-${i}%02d 12:00:00")
    // Day i: i purchases and 2i views (r = +1 once the window fills),
    // window = 3 days -> days 1-2 emit null, days 3+ emit 1.0.
    val up = (1 to 5).flatMap(i =>
      Seq.fill(i)(("purchase", day(i))) ++ Seq.fill(2 * i)(("view", day(i))))
    val got = Anomaly.rollingCorrelation(up.toDF("event_type", "ts"),
        "ts", "event_type", "purchase", "view", windowDays = 3)
      .orderBy("day").collect()
    assert(got.take(2).forall(_.isNullAt(3)), "partial windows stay null")
    assert(got.drop(2).forall(_.getDouble(3) == 1.0))
    // Anti-correlated: purchases rise 1..5 while views fall 5..1.
    val down = (1 to 5).flatMap(i =>
      Seq.fill(i)(("purchase", day(i))) ++ Seq.fill(6 - i)(("view", day(i))))
    val g2 = Anomaly.rollingCorrelation(down.toDF("event_type", "ts"),
        "ts", "event_type", "purchase", "view", windowDays = 3)
      .orderBy("day").collect()
    assert(g2.drop(2).forall(_.getDouble(3) == -1.0))
    // Constant views -> zero variance -> null, not NaN.
    val const = (1 to 5).flatMap(i =>
      Seq.fill(i)(("purchase", day(i))) ++ Seq.fill(3)(("view", day(i))))
    val g3 = Anomaly.rollingCorrelation(const.toDF("event_type", "ts"),
        "ts", "event_type", "purchase", "view", windowDays = 3)
      .collect()
    assert(g3.forall(_.isNullAt(3)))
  }

  test("chiSquareIndependence: independence scores 0, determinism scores 1") {
    // Perfectly balanced 2x2: chi2 = 0, V = 0, dof = 1.
    val bal = (Seq.fill(10)(("x", 0)) ++ Seq.fill(10)(("x", 1)) ++
      Seq.fill(10)(("y", 0)) ++ Seq.fill(10)(("y", 1))).toDF("a", "b")
    val g0 = Anomaly.chiSquareIndependence(bal, "a", "b").collect()
    assert(g0.length == 4)
    assert(g0.forall(_.getDouble(g0.head.fieldIndex("chi2")) == 0.0))
    assert(g0.forall(_.getDouble(g0.head.fieldIndex("cramers_v")) == 0.0))
    assert(g0.forall(_.getLong(g0.head.fieldIndex("dof")) == 1L))
    // Perfect dependence incl. ZERO cells: x only pairs with 0, y only
    // with 1 -> the grid must still carry (x,1)/(y,0) with o=0, every
    // e = 5, every contrib = 5, chi2 = N = 20, V = 1.
    val dep = (Seq.fill(10)(("x", 0)) ++ Seq.fill(10)(("y", 1))).toDF("a", "b")
    val g1 = Anomaly.chiSquareIndependence(dep, "a", "b").collect()
    assert(g1.length == 4, "zero cells must be materialized")
    assert(g1.forall(r => r.getDouble(r.fieldIndex("e")) == 5.0))
    assert(g1.forall(r => r.getDouble(r.fieldIndex("chi2")) == 20.0))
    assert(g1.forall(r => r.getDouble(r.fieldIndex("cramers_v")) == 1.0))
    val zeros = g1.filter(_.getLong(g1.head.fieldIndex("o")) == 0L)
    assert(zeros.length == 2 && zeros.forall(r =>
      r.getDouble(r.fieldIndex("contrib")) == 5.0))
  }

  test("forecastModelSelect: each planted shape crowns the right model") {
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2023, 1, 1).plusDays(i - 1).atTime(12, 0))
    val df = (
      // Clean ramp: Holt is exact; HW (first cycle unseasoned) ties it,
      // Occam priority must crown 'holt'.
      (1 to 28).map(i => ("ramp", day(i), 10.0 + 2.0 * i)) ++
      // Pure weekly rhythm, no trend: only HW absorbs it.
      (1 to 49).map(i => ("cycle", day(i), if (i % 7 == 0) 80.0 else 10.0)) ++
      // Constant: everyone is exact; the naive chart wins by priority.
      (1 to 20).map(i => ("flat", day(i), 5.0))
    ).toDF("grp", "ts", "v")
    val got = Anomaly.forecastModelSelect(df, "grp", "ts", "v", period = 7,
        alpha = 0.2, beta = 0.05, gamma = 0.6)
      .orderBy("grp").collect()
      .map(r => r.getString(0) -> (r.getString(r.fieldIndex("best")),
        r.getDouble(r.fieldIndex("mae_holt")))).toMap
    assert(got("flat")._1 == "naive", s"flat: $got")
    assert(got("ramp")._1 == "holt", s"ramp: $got")
    assert(got("ramp")._2 == 0.0, "Holt is exact on a clean ramp")
    assert(got("cycle")._1 == "hw", s"cycle: $got")
  }

  test("trendFit: exact line recovered, degenerate groups go null") {
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2023-01-${i}%02d 12:00:00")
    val df = ((1 to 10).map(i => ("line", day(i), 2.0 * i + 1.0)) ++
      (1 to 10).map(i => ("flat", day(i), 7.0)) :+
      (("solo", day(1), 3.0))).toDF("grp", "ts", "v")
    val got = Anomaly.trendFit(df, "grp", "ts", "v")
      .orderBy("grp").collect()
    val flat = got(0); val line = got(1); val solo = got(2)
    assert(line.getDouble(line.fieldIndex("slope")) == 2.0)
    assert(line.getDouble(line.fieldIndex("intercept")) == 1.0)
    assert(line.getDouble(line.fieldIndex("r2")) == 1.0)
    assert(flat.getDouble(flat.fieldIndex("slope")) == 0.0)
    assert(flat.isNullAt(flat.fieldIndex("r2")), "constant series has no r2")
    assert(solo.isNullAt(solo.fieldIndex("slope")), "one day fits no line")
    assert(solo.getLong(solo.fieldIndex("n_days")) == 1L)
  }

  test("trimmedMeans: rank-exact trim/clamp, floor trap pinned, k=0 degenerates to mean") {
    val df = (Seq(0.0, 1.0, 2.0, 9.0, 100.0).map(("a", _)) ++
      Seq(("tiny", 5.0), ("tiny", 7.0)) ++
      Seq(("nulls", 1.0), ("nulls", Double.NaN))) // NaN placeholder replaced below
      .toDF("g", "v")
      .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
    val got = Anomaly.trimmedMeans(df, "g", "v", alpha = 0.2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // a: n=5, k=1 -> trimmed mean(1,2,9) = 4.0; winsorized (12+1+9)/5 = 4.4.
    assert(got("a") == ((5L, 1L, 4.0, 4.4)))
    // tiny: n=2, k=0 -> both equal the plain mean.
    assert(got("tiny") == ((2L, 0L, 6.0, 6.0)))
    // nulls dropped before ranking: n=1.
    assert(got("nulls")._1 == 1L && got("nulls")._3 == 1.0)
    // Pin the k arithmetic on a boundary-ish alpha: 0.3d * 10 rounds
    // to EXACTLY 3.0 (ties-to-even lands on the representable 3.0), so
    // k = 3 — and the oracle's CAST(0.3 AS DOUBLE) * n computes the
    // identical double. (The convention matters at products like
    // 0.29 * 100 = 28.999999999999996, where decimal arithmetic would
    // floor to 29 instead of 28.) Values 1..10, k=3: mean(4..7) = 5.5.
    val ten = (1 to 10).map(i => ("t", i.toDouble)).toDF("g", "v")
    val t = Anomaly.trimmedMeans(ten, "g", "v", alpha = 0.3).collect().head
    assert(t.getLong(2) == 3L, s"k must floor the double product: $t")
    assert(t.getDouble(3) == 5.5)
    // Robustness headline: the 100 outlier drags the plain mean to 22.4
    // while both robust estimates stay near the bulk.
    assert(got("a")._3 < 5.0 && got("a")._4 < 5.0)
  }

  test("spearmanCorrelation: monotone-invariant, average-rank ties, degenerate null") {
    // Perfectly monotone but wildly nonlinear: Pearson < 1, Spearman = 1.
    val mono = (1 to 12).map(i => ("mono", i.toDouble, math.pow(10.0, i)))
    val inv = (1 to 12).map(i => ("inv", i.toDouble, -math.pow(10.0, i)))
    val const = (1 to 12).map(i => ("const", i.toDouble, 5.0))
    val df = (mono ++ inv ++ const).toDF("g", "x", "y")
    val got = Anomaly.spearmanCorrelation(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(got("mono") == Some(1.0))
    assert(got("inv") == Some(-1.0))
    assert(got("const").isEmpty, "zero rank variance on y -> null")
    // Hand-checked ties: x = 1,2,3,4; y = 10,20,20,40.
    // y average ranks: 1, 2.5, 2.5, 4; x ranks 1..4.
    // n=4 sx=10 sy=10 sxy=(1 + 5 + 7.5 + 16)=29.5 sxx=30 syy=(1+6.25+6.25+16)=29.5
    // num = 4*29.5-100 = 18; vx = 120-100 = 20; vy = 118-100 = 18
    // rho = 18/sqrt(360) ~ 0.948683
    val ties = Seq(("t", 1.0, 10.0), ("t", 2.0, 20.0), ("t", 3.0, 20.0),
      ("t", 4.0, 40.0)).toDF("g", "x", "y")
    val rho = Anomaly.spearmanCorrelation(ties, "g", "x", "y")
      .collect().head.getDouble(2)
    assert(rho == math.rint(18.0 / math.sqrt(360.0) * 1e6) / 1e6)
  }

  test("kendallTau: concordance hand values, tie corrections, degenerate null") {
    val mono = (1 to 12).map(i => ("mono", i.toDouble, math.pow(10.0, i)))
    val inv = (1 to 12).map(i => ("inv", i.toDouble, -math.pow(10.0, i)))
    val const = (1 to 12).map(i => ("const", i.toDouble, 5.0))
    // ties: x = 1,2,3,4; y = 10,20,20,40 -> S = 5, n1 = 0, n2 = 1,
    // n0 = 6, tau = 5/sqrt(30).
    val ties = Seq(("t", 1.0, 10.0), ("t", 2.0, 20.0), ("t", 3.0, 20.0),
      ("t", 4.0, 40.0))
    val got = Anomaly.kendallTau(
        (mono ++ inv ++ const ++ ties).toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), Option(r.get(5)))).toMap
    assert(got("mono") == ((66L, Some(1.0))))   // all 66 pairs concordant
    assert(got("inv") == ((-66L, Some(-1.0))))
    assert(got("const")._2.isEmpty, "all-tied y -> n0 = n2 -> null")
    assert(got("t") == ((5L,
      Some(math.rint(5.0 / math.sqrt(30.0) * 1e6) / 1e6))))
  }

  test("dowEnvelope: exact rank quantiles per weekday, max-of-first-k selection") {
    // 2023-01-02 is a Monday (Spark dow 2). Five Mondays with daily
    // means 10, 20, 30, 40, 50 (one value per day): n=5 ->
    // p10 rank ceil(0.5)=1 -> 10; median rank 3 -> 30; p90 rank
    // ceil(4.5)=5 -> 50.
    def monday(k: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2023, 1, 2, 12, 0).plusDays(7L * k))
    val df = (0 until 5).map(k => ("g", monday(k), 10.0 * (k + 1)))
      .toDF("grp", "ts", "v")
    val got = Anomaly.dowEnvelope(df, "grp", "ts", "v").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getInt(r.fieldIndex("dow")) == 2)
    assert(r.getLong(r.fieldIndex("n_days")) == 5L)
    assert(r.getDouble(r.fieldIndex("p10")) == 10.0)
    assert(r.getDouble(r.fieldIndex("median")) == 30.0)
    assert(r.getDouble(r.fieldIndex("p90")) == 50.0)
    // n=10 ranks: p10 -> 1, median -> 5, p90 -> 9.
    val ten = (0 until 10).map(k => ("g", monday(k), (k + 1).toDouble))
      .toDF("grp", "ts", "v")
    val t = Anomaly.dowEnvelope(ten, "grp", "ts", "v").collect().head
    assert(t.getDouble(t.fieldIndex("p10")) == 1.0)
    assert(t.getDouble(t.fieldIndex("median")) == 5.0)
    assert(t.getDouble(t.fieldIndex("p90")) == 9.0)
  }

  test("mannKendall: integer S, tie-corrected variance, z calls the trend") {
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2023-01-${i}%02d 12:00:00")
    val df = ((1 to 10).map(i => ("up", day(i), i.toDouble)) ++
      (1 to 10).map(i => ("down", day(i), -i.toDouble)) ++
      (1 to 10).map(i => ("flat", day(i), 7.0)) ++
      (1 to 10).map(i => ("alt", day(i), if (i % 2 == 1) 1.0 else 2.0)) :+
      (("solo", day(1), 3.0))).toDF("grp", "ts", "v")
    val got = Anomaly.mannKendall(df, "grp", "ts", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // up: all 45 pairs ascend -> S=45, no ties: var = 10*9*25/18 = 125,
    // z = 44/sqrt(125), trend increasing.
    val up = got("up")
    assert(up.getLong(2) == 45L && up.getDouble(3) == 125.0)
    assert(up.getDouble(4) == math.rint(44.0 / math.sqrt(125.0) * 1e6) / 1e6)
    assert(up.getString(5) == "increasing")
    val down = got("down")
    assert(down.getLong(2) == -45L && down.getString(5) == "decreasing")
    // flat: all pairs tied -> S=0, tie correction zeroes the variance,
    // z null, no trend call.
    val flat = got("flat")
    assert(flat.getLong(2) == 0L && flat.getDouble(3) == 0.0)
    assert(flat.isNullAt(4) && flat.getString(5) == "none")
    // alternating 1,2: S = 15 - 10 = 5; ties 2x t=5 -> tie_sum 600,
    // var = (2250-600)/18; z ~ 0.42 -> "none".
    val alt = got("alt")
    assert(alt.getLong(2) == 5L)
    assert(alt.getDouble(3) == math.rint((2250.0 - 600.0) / 18.0 * 1e6) / 1e6)
    assert(alt.getString(5) == "none")
    assert(got("solo").isNullAt(4) && got("solo").getString(5) == "none")
  }

  test("theilSenFit: exact line, 30%-outlier immunity where OLS drifts, lower-median rule") {
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2023-01-${i}%02d 12:00:00")
    // Clean line: every pairwise slope is exactly 2.0, every residual 1.0.
    val line = (1 to 10).map(i => ("line", day(i), 2.0 * i + 1.0))
    // Ramp with 3 of 11 days corrupted to wild values — clustered LATE
    // so they cannot cancel in OLS (symmetric outliers nearly do): the
    // pair-slope MEDIAN still sits on a clean-pair slope (= 2.0
    // exactly; 28 clean pairs straddle the rank-28 median of 55),
    // while OLS is dragged to ~83.
    val dirty = (1 to 11).map { i =>
      val v = if (i >= 8 && i <= 10) 1000.0 + i else 2.0 * i + 1.0
      ("dirty", day(i), v)
    }
    val solo = Seq(("solo", day(1), 3.0))
    val df = (line ++ dirty ++ solo).toDF("grp", "ts", "v")
    val got = Anomaly.theilSenFit(df, "grp", "ts", "v")
      .orderBy("grp").collect()
    val d = got(0); val l = got(1); val s = got(2)
    assert(l.getString(0) == "line" && d.getString(0) == "dirty" && s.getString(0) == "solo")
    assert(l.getDouble(l.fieldIndex("slope")) == 2.0)
    assert(l.getDouble(l.fieldIndex("intercept")) == 1.0)
    assert(d.getDouble(d.fieldIndex("slope")) == 2.0,
      "pairwise-slope median must shrug off 3/11 wild days")
    val ols = Anomaly.trendFit(df, "grp", "ts", "v")
      .filter(col("grp") === "dirty").collect().head
    assert(math.abs(ols.getDouble(ols.fieldIndex("slope")) - 2.0) > 5.0,
      "OLS must be visibly dragged by the outliers (the contrast the operator exists for)")
    assert(s.isNullAt(s.fieldIndex("slope")) && s.isNullAt(s.fieldIndex("intercept")))
    assert(s.getLong(s.fieldIndex("n_days")) == 1L)
    // Lower-median convention: 3 days -> 3 pair slopes; make them
    // distinct (1.0, 2.0, 3.0 between consecutive+skip pairs) and pin
    // the rank-2 pick. days: m = 1, 2, 5 -> slopes: (2-1)/1=1, (5-2)/1=3,
    // (5-1)/2=2 -> sorted (1,2,3), lower median = 2.
    val tri = Seq(("t", day(1), 1.0), ("t", day(2), 2.0), ("t", day(3), 5.0))
      .toDF("grp", "ts", "v")
    val t = Anomaly.theilSenFit(tri, "grp", "ts", "v").collect().head
    assert(t.getDouble(t.fieldIndex("slope")) == 2.0)
    // Even count: 2 days -> 1 pair; 4 slopes case: days m = 0,1,3,6 ->
    // slopes 1,2,3 (consecutive), 1.5, 2.5 (skip-1), 2 (skip-2) -> sorted
    // (1, 1.5, 2, 2, 2.5, 3), lower median = rank (6+1)//2 = 3 -> 2.0.
    val even = Seq(("e", day(1), 0.0), ("e", day(2), 1.0),
      ("e", day(3), 3.0), ("e", day(4), 6.0)).toDF("grp", "ts", "v")
    val e = Anomaly.theilSenFit(even, "grp", "ts", "v").collect().head
    assert(e.getDouble(e.fieldIndex("slope")) == 2.0)
  }

  test("forecastBacktest: skill 1 on a clean ramp, null skill when naive is perfect") {
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2023-01-${i}%02d 12:00:00")
    // Clean linear ramp: the two-point trend seed makes every Holt
    // one-step forecast exact (error 0 from day 2 on), while the naive
    // chart misses by the slope every day -> MAE_h = 0, MAE_n = slope,
    // skill = 1. A constant series gives MAE_n = 0 -> skill null (never
    // a division blow-up).
    val ramp = (1 to 15).map(i => ("ramp", day(i), 10.0 + 2.0 * i)) ++
      (1 to 15).map(i => ("flat", day(i), 7.0))
    val got = Anomaly.forecastBacktest(ramp.toDF("grp", "ts", "v"),
        "grp", "ts", "v", alpha = 0.5, beta = 0.5)
      .orderBy("grp").collect()
    assert(got.length == 2)
    val flat = got(0); val r = got(1)
    assert(r.getString(0) == "ramp")
    assert(r.getLong(r.fieldIndex("n_days")) == 14L)
    assert(r.getDouble(r.fieldIndex("mae_holt")) == 0.0)
    assert(math.abs(r.getDouble(r.fieldIndex("mae_naive")) - 2.0) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("skill")) - 1.0) < 1e-9)
    assert(flat.getString(0) == "flat")
    assert(flat.getDouble(flat.fieldIndex("mae_holt")) == 0.0)
    assert(flat.getDouble(flat.fieldIndex("mae_naive")) == 0.0)
    assert(flat.isNullAt(flat.fieldIndex("skill")))
    // Negative skill when the model is WORSE than naive: alpha tiny on
    // a level shift makes Holt lag badly; the score must go negative,
    // not clamp.
    val shift = ((1 to 10).map(i => ("s", day(i), 10.0)) ++
      (11 to 20).map(i => ("s", day(i), 10.0 + (i - 10) * 5.0)))
    val sk = Anomaly.forecastBacktest(shift.toDF("grp", "ts", "v"),
        "grp", "ts", "v", alpha = 0.05, beta = 0.01)
      .select("skill").as[Double].collect().head
    assert(sk < 0.0, s"lagging model must score negative skill, got $sk")
  }
}
