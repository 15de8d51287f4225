package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // u1 completes the whole funnel in order; u2 clicks BEFORE viewing
  // (the click must not count) then never re-clicks; u3 views only;
  // u4 never views (excluded entirely); u5 views, clicks, then
  // purchases BEFORE the click is irrelevant — purchase after click.
  private lazy val events = Seq(
    ("u1", ts("2024-01-01 10:00:00"), "view"),
    ("u1", ts("2024-01-01 10:05:00"), "click"),
    ("u1", ts("2024-01-01 10:10:00"), "purchase"),
    ("u2", ts("2024-01-02 09:00:00"), "click"),
    ("u2", ts("2024-01-02 09:30:00"), "view"),
    ("u3", ts("2024-01-03 08:00:00"), "view"),
    ("u4", ts("2024-01-04 07:00:00"), "purchase"),
    ("u5", ts("2024-01-05 06:00:00"), "view"),
    ("u5", ts("2024-01-05 06:01:00"), "purchase"), // before click: step 3 no
    ("u5", ts("2024-01-05 06:02:00"), "click"),
    ("u5", ts("2024-01-05 06:03:00"), "purchase") // after click: counts
  ).toDF("user_id", "ts", "event_type")

  test("activeUsers: trailing windows, inactive-day drop, max-day clip") {
    val act = Seq(
      ("u1", ts("2024-01-01 10:00:00")), ("u1", ts("2024-01-01 18:00:00")),
      ("u2", ts("2024-01-01 11:00:00")),
      ("u1", ts("2024-01-03 09:00:00")),
      ("u3", ts("2024-01-10 08:00:00")),
      (null.asInstanceOf[String], ts("2024-01-02 00:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.activeUsers(act, "user_id", "ts",
        wauDays = 2, mauDays = 3)
      .orderBy("day")
      .select(col("day").cast("string"), col("dau"), col("wau"), col("mau"),
        col("stickiness"))
      .as[(String, Long, Long, Long, Double)].collect()
    // Day 2 has only the null user -> no activity row; days 11/12 are
    // past the observed max -> clipped even though u3 is "visible".
    assert(got.map(_._1).toSeq == Seq("2024-01-01", "2024-01-03", "2024-01-10"))
    // d1: dau {u1,u2}; wau [d0,d1] = 2; mau [cd-2,d1] = 2.
    assert(got(0) == (("2024-01-01", 2L, 2L, 2L, 1.0)))
    // d3: dau {u1}; wau [d2,d3] = {u1}; mau [d1..d3] = {u1,u2}.
    assert(got(1) == (("2024-01-03", 1L, 1L, 2L, 1.0)))
    assert(got(2) == (("2024-01-10", 1L, 1L, 1L, 1.0)))
  }

  test("activeUsers: stickiness = dau/wau; multi-day users counted once per window") {
    val act = Seq(
      ("a", ts("2024-02-01 10:00:00")), ("b", ts("2024-02-01 10:00:00")),
      ("c", ts("2024-02-01 10:00:00")), ("a", ts("2024-02-02 10:00:00")),
      ("a", ts("2024-02-03 10:00:00")), ("d", ts("2024-02-03 10:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.activeUsers(act, "user_id", "ts")
      .orderBy("day")
      .select(col("day").cast("string"), col("dau"), col("wau"), col("mau"),
        col("stickiness"))
      .as[(String, Long, Long, Long, Double)].collect()
    // d3: dau {a,d} = 2; wau(7) back to 1/28 -> {a,b,c,d} = 4 (a once).
    assert(got(2) == (("2024-02-03", 2L, 4L, 4L, 0.5)))
    assert(got(1) == (("2024-02-02", 1L, 3L, 3L,
      math.rint(1.0 / 3 * 1e6) / 1e6)))
  }

  test("returnRate: lead-gap semantics, partial-horizon days null the rate") {
    val act = Seq(
      ("u1", ts("2024-01-01 10:00:00")), ("u1", ts("2024-01-02 09:00:00")),
      ("u2", ts("2024-01-01 11:00:00")), ("u2", ts("2024-01-05 10:00:00")),
      ("u3", ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.returnRate(act, "user_id", "ts", horizonDays = 2)
      .orderBy("day")
      .select(col("day").cast("string"), col("n_active"), col("n_returned"),
        col("return_rate"))
      .collect()
    // d1: 3 active; only u1 returns within 2 days (u2's gap is 4).
    assert(got(0).getString(0) == "2024-01-01")
    assert(got(0).getLong(1) == 3L && got(0).getLong(2) == 1L)
    assert(got(0).getDouble(3) == math.rint(1.0 / 3 * 1e6) / 1e6)
    // d2: u1 active, never returns -> 0.0 (observable: max - d2 = 3 >= 2).
    assert(got(1).getLong(1) == 1L && got(1).getDouble(3) == 0.0)
    // d5 = max day: horizon unobservable -> rate null, counts kept.
    assert(got(2).getString(0) == "2024-01-05")
    assert(got(2).getLong(1) == 1L && got(2).isNullAt(3))
  }

  test("retentionDays: exactly-day-N semantics, horizon nulls, cohort sizing") {
    def d(i: Int) = ts(f"2024-01-${i}%02d 10:00:00")
    val act = Seq(
      // cohort d1: u1 (back on d2 AND d8), u2 (back d3 only), u3 (never)
      ("u1", d(1)), ("u1", d(2)), ("u1", d(8)),
      ("u2", d(1)), ("u2", d(3)),
      ("u3", d(1)),
      // cohort d20: u4 — offsets 1/7 unobservable? max day = 21 ->
      // r1 observable (21-20 >= 1), r7 NOT (21-20 < 7).
      ("u4", d(20)), ("u4", d(21))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.retentionDays(act, "user_id", "ts",
        offsets = Seq(1, 7))
      .orderBy("cohort")
      .select(col("cohort").cast("string"), col("n_users"),
        col("d1"), col("r1"), col("d7"), col("r7"))
      .collect()
    val c1 = got(0)
    assert(c1.getString(0) == "2024-01-01")
    assert(c1.getLong(1) == 3L)
    assert(c1.getLong(2) == 1L) // only u1 on exactly d2
    assert(c1.getDouble(3) == math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(c1.getLong(4) == 1L) // u1 on exactly d8
    assert(c1.getDouble(5) == math.rint(1.0 / 3 * 1e6) / 1e6)
    val c20 = got(1)
    assert(c20.getString(0) == "2024-01-20")
    assert(c20.getLong(1) == 1L && c20.getLong(2) == 1L)
    assert(c20.getDouble(3) == 1.0)
    assert(c20.getLong(4) == 0L && c20.isNullAt(5),
      "day-7 rate unobservable for a cohort 1 day from the corpus edge")
  }

  test("typeDiversity: hand entropy/HHI, single-type day reads exactly zero") {
    val ev = Seq(
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 11:00:00")),
      ("b", ts("2024-01-01 12:00:00")), ("b", ts("2024-01-01 13:00:00")),
      ("a", ts("2024-01-02 10:00:00")), ("a", ts("2024-01-02 11:00:00")),
      ("a", ts("2024-01-02 12:00:00")),
      ("a", ts("2024-01-03 10:00:00")), ("a", ts("2024-01-03 11:00:00")),
      ("b", ts("2024-01-03 12:00:00")), ("b", ts("2024-01-03 13:00:00")),
      ("c", ts("2024-01-03 14:00:00")), ("c", ts("2024-01-03 15:00:00")),
      ("c", ts("2024-01-03 16:00:00")), ("c", ts("2024-01-03 17:00:00"))
    ).toDF("event_type", "ts")
    val got = EventAnalytics.typeDiversity(ev, "ts", "event_type")
      .orderBy("day")
      .select(col("day").cast("string"), col("n_events"), col("n_types"),
        col("entropy"), col("herfindahl"))
      .as[(String, Long, Long, Double, Double)].collect()
    // d1: 50/50 -> entropy exactly 1 bit, HHI 0.5.
    assert(got(0) == (("2024-01-01", 4L, 2L, 1.0, 0.5)))
    // d2: one type -> entropy exactly 0.0 (and +0.0, not -0.0), HHI 1.0.
    assert(got(1) == (("2024-01-02", 3L, 1L, 0.0, 1.0)))
    assert(java.lang.Double.doubleToLongBits(got(1)._4) == 0L,
      "entropy of a pure day must be +0.0 — -0.0 would hash differently")
    // d3: shares 2/8, 2/8, 4/8 -> H = 1.5 bits exactly; HHI = 0.375.
    assert(got(2) == (("2024-01-03", 8L, 3L, 1.5, 0.375)))
  }

  test("funnelWindowed: transition deadlines bind to the milestone, not the path start") {
    val ev = Seq(
      // w1: view -> click 1h later -> purchase 1h after click: all in.
      ("w1", ts("2024-01-01 10:00:00"), "view"),
      ("w1", ts("2024-01-01 11:00:00"), "click"),
      ("w1", ts("2024-01-01 12:00:00"), "purchase"),
      // w2: click 3h after view -> outside the 2h window; a later
      // re-click cannot rescue it (deadline binds to the milestone).
      ("w2", ts("2024-01-01 10:00:00"), "view"),
      ("w2", ts("2024-01-01 13:00:00"), "click"),
      ("w2", ts("2024-01-01 14:00:00"), "purchase"),
      // w3: click at 1h59m (in), purchase 1h59m after CLICK (in, even
      // though it is ~4h after the view — per-transition, not global).
      ("w3", ts("2024-01-01 10:00:00"), "view"),
      ("w3", ts("2024-01-01 11:59:00"), "click"),
      ("w3", ts("2024-01-01 13:58:00"), "purchase"),
      // w4: an EARLY too-late click must not shadow a later in-window
      // one... there is no such thing — min-ts takes the FIRST
      // in-window completion; a pre-window (too early) click is
      // impossible, so test the boundary: click at exactly +2h is IN
      // (<=), at +2h1s would be out.
      ("w4", ts("2024-01-01 10:00:00"), "view"),
      ("w4", ts("2024-01-01 12:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelWindowed(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapSeconds = 7200)
      .collect().map(r => r.getString(0) -> r.getInt(r.fieldIndex("steps_completed")))
      .toMap
    assert(got == Map("w1" -> 3, "w2" -> 1, "w3" -> 3, "w4" -> 2))
    // The unwindowed funnel on the same events completes w2 fully —
    // the deadline is the only difference.
    val plain = EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getInt(r.fieldIndex("steps_completed")))
      .toMap
    assert(plain("w2") == 3)
  }

  test("interArrival: integer-micro gaps, rank quantiles, same-instant zero gaps") {
    // Gaps for g: 1s, 1s, 2s, 60s (n=4): mean = 16s; p50 rank 2 -> 1s;
    // p90 rank ceil(3.6)=4 -> 60s.
    val ev = Seq(
      ("g", ts("2024-01-01 10:00:00")), ("g", ts("2024-01-01 10:00:01")),
      ("g", ts("2024-01-01 10:00:02")), ("g", ts("2024-01-01 10:00:04")),
      ("g", ts("2024-01-01 10:01:04")),
      // one event only -> no gaps -> no row
      ("solo", ts("2024-01-01 10:00:00")),
      // same-instant pair -> one honest zero gap
      ("tie", ts("2024-01-01 10:00:00")), ("tie", ts("2024-01-01 10:00:00"))
    ).toDF("event_type", "ts")
    val got = EventAnalytics.interArrival(ev, "event_type", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!got.contains("solo"))
    val g = got("g")
    assert(g.getLong(1) == 4L)
    assert(g.getDouble(2) == 16.0)
    assert(g.getDouble(3) == 1.0)
    assert(g.getDouble(4) == 60.0)
    val tie = got("tie")
    assert(tie.getLong(1) == 1L && tie.getDouble(2) == 0.0
      && tie.getDouble(3) == 0.0)
  }

  test("funnel: min-ts chain honors strict ordering") {
    val f = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
    val byUser = f.collect().map(r => r.getString(0) -> r).toMap
    // u4 never viewed -> not present at all.
    assert(byUser.keySet == Set("u1", "u2", "u3", "u5"))
    assert(byUser("u1").getInt(byUser("u1").fieldIndex("steps_completed")) == 3)
    // u2's click predates the first view -> stuck at step 1.
    assert(byUser("u2").getInt(byUser("u2").fieldIndex("steps_completed")) == 1)
    assert(byUser("u3").getInt(byUser("u3").fieldIndex("steps_completed")) == 1)
    // u5's purchase before the click doesn't count; the later one does.
    val u5 = byUser("u5")
    assert(u5.getInt(u5.fieldIndex("steps_completed")) == 3)
    assert(u5.getTimestamp(u5.fieldIndex("step3_ts")) == ts("2024-01-05 06:03:00"))
  }

  test("funnelSummary: reach and conversion vs step 1") {
    val s = EventAnalytics.funnelSummary(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step")
      .select("step", "step_type", "users", "conversion")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(s == Seq(
      (1, "view", 4L, 1.0),
      (2, "click", 2L, 0.5),
      (3, "purchase", 2L, 0.5)))
  }

  test("cohortRetention: offset-0 is 1.0 and later offsets count returners") {
    // Cohort week 0 (anchor 2024-01-01): u1, u2 first seen in week 0;
    // u1 returns in week 1, u2 doesn't. u3 is a week-1 cohort of one.
    val df = Seq(
      ("u1", ts("2024-01-02 00:00:00")),
      ("u2", ts("2024-01-03 00:00:00")),
      ("u1", ts("2024-01-09 00:00:00")), // week 1 return
      ("u3", ts("2024-01-10 00:00:00"))
    ).toDF("user_id", "ts")
    val r = EventAnalytics.cohortRetention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .select("cohort_week", "week_offset", "active_users", "cohort_size", "retention")
      .as[(Int, Int, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (0, 0, 2L, 2L, 1.0),
      (0, 1, 1L, 2L, 0.5),
      (1, 0, 1L, 1L, 1.0)))
  }

  test("funnel rejects an empty step list") {
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(events, "user_id", "ts", "event_type", Seq.empty)
    }
  }

  test("lastTouchAttribution: window, ordering, ties, and the organic bucket") {
    val df = Seq(
      // u1: click then view then purchase -> view (most recent) wins.
      (1L, "u1", ts("2024-01-10 09:00:00"), "click"),
      (2L, "u1", ts("2024-01-10 10:00:00"), "view"),
      (3L, "u1", ts("2024-01-10 11:00:00"), "purchase"),
      // u2: only touch is OUTSIDE the 7-day window -> organic (null).
      (4L, "u2", ts("2024-01-01 00:00:00"), "view"),
      (5L, "u2", ts("2024-01-09 00:00:01"), "purchase"),
      // u3: two touches at the SAME ts -> highest touch id wins.
      (6L, "u3", ts("2024-01-05 12:00:00"), "view"),
      (7L, "u3", ts("2024-01-05 12:00:00"), "click"),
      (8L, "u3", ts("2024-01-05 13:00:00"), "purchase"),
      // u4: touch only AFTER the conversion -> organic.
      (9L, "u4", ts("2024-01-06 10:00:00"), "purchase"),
      (10L, "u4", ts("2024-01-06 11:00:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.lastTouchAttribution(df, "user_id", "ts",
        "event_type", "event_id", "purchase", Seq("view", "click"), 7L * 86400L)
      .orderBy("conversion_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(3L -> Some(2L), 5L -> None, 8L -> Some(7L), 9L -> None))
  }

  test("survivalCurve: hand KM with censoring; curve non-increasing; zero tail") {
    def d(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 12:00:00")
    // Corpus end = day 20. Churn gap 7: last event after day 13 = censored.
    // u1: days 1-2  -> lifetime 1, churned (last day 2)
    // u2: days 1-4  -> lifetime 3, churned
    // u3: days 1-4  -> lifetime 3, churned
    // u4: days 5-20 -> lifetime 15, censored (at risk, never a death)
    // u5: day 20    -> lifetime 0, censored
    val df = Seq(
      ("u1", d(1)), ("u1", d(2)),
      ("u2", d(1)), ("u2", d(4)),
      ("u3", d(1)), ("u3", d(4)),
      ("u4", d(5)), ("u4", d(20)),
      ("u5", d(20))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.survivalCurve(df, "user_id", "ts", churnGapDays = 7)
      .orderBy("t")
      .select("t", "n_risk", "n_churn", "survival")
      .as[(Int, Long, Long, Double)].collect().toSeq
    // t=0: exits u5 (censored), n=5, d=0 -> S=1
    // t=1: u1 churns, n_risk=4 -> S=0.75
    // t=3: u2,u3 churn, n_risk=3 -> S=0.75*(1-2/3)=0.25
    // t=15: u4 censored exit, n_risk=1, d=0 -> S stays 0.25
    assert(got == Seq(
      (0, 5L, 0L, 1.0),
      (1, 4L, 1L, 0.75),
      (3, 3L, 2L, 0.25),
      (15, 1L, 0L, 0.25)))
    // All-churned corpus: the curve must hit exactly 0, not log-blow-up.
    val allGone = Seq(("a", d(1)), ("b", d(1)), ("b", d(2))).toDF("user_id", "ts")
    // corpus end = day 2; gap 7 -> nobody is censored? last within gap ->
    // all censored, S stays 1. Force churn with a far sentinel user.
    val withEnd = allGone.union(Seq(("z", d(28))).toDF("user_id", "ts"))
    val s = EventAnalytics.survivalCurve(withEnd, "user_id", "ts", churnGapDays = 7)
      .orderBy("t").select("t", "survival").as[(Int, Double)].collect()
    assert(s.last._2 >= 0.0 && s.map(_._2).sliding(2).forall {
      case Array(a, b) => b <= a + 1e-9; case _ => true
    }, s"non-increasing: ${s.mkString(",")}")
  }

  test("quantileTest: per-arm exact order statistics and shift detection") {
    def armOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) % 2
    }
    // Arm 1 users get arm-0 values shifted by exactly +100: every order
    // statistic must shift by exactly 100 regardless of arm sizes.
    val ids = (1L to 80L).toSeq
    def v(i: Long) = (i % 13).toDouble + 1.0
    val df = ids.map(i =>
      (i, if (armOf(i) == 0L) v(i) else v(i) + 100.0)).toDF("user_id", "value")
    val got = EventAnalytics.quantileTest(df, "user_id", "value").collect().head
    val (na, nb) = (got.getLong(0), got.getLong(1))
    assert(na + nb == 80L && na > 0 && nb > 0)
    // same per-arm distribution family: but sizes differ, so compute the
    // exact expected medians from the fixture
    def stats(vals: Seq[Double]) = {
      val s = vals.sorted
      val n = s.length
      (s(((n + 1) / 2) - 1), s(((9 * n + 9) / 10) - 1))
    }
    val (medA, p90A) = stats(ids.filter(armOf(_) == 0L).map(v))
    val (medB, p90B) = stats(ids.filter(armOf(_) == 1L).map(i => v(i) + 100.0))
    assert(got.getDouble(2) == medA && got.getDouble(3) == medB, s"medians: $got")
    assert(got.getDouble(4) == p90A && got.getDouble(5) == p90B, s"p90s: $got")
    assert(got.getDouble(6) == BigDecimal(medB - medA)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.getDouble(7) == BigDecimal(p90B - p90A)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("mannWhitneyTest: perfect separation hits effect ±1; all-tied degenerates to null z") {
    // Replicate the engine's md5 coin so the fixture can place each
    // user's metric BY ARM.
    def armOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) % 2
    }
    val ids = (1L to 60L).toSeq
    // Arm 0 users get value 1..k (low), arm 1 users 1000+ (high):
    // every B beats every A -> U_a = 0 is the A-side count of wins?
    // U_a counts A-over-B wins: A all low -> U_a = 0, effect = -1.
    val sep = ids.map(i =>
      (i, if (armOf(i) == 0L) i.toDouble else 1000.0 + i)).toDF("user_id", "value")
    val s = EventAnalytics.mannWhitneyTest(sep, "user_id", "value").collect().head
    val (na, nb) = (s.getLong(0), s.getLong(1))
    assert(na > 0 && nb > 0 && na + nb == 60L)
    assert(s.getDouble(2) == 0.0, s"U_a must be 0 at full separation, got $s")
    assert(s.getDouble(4) == -1.0, s"effect must be -1, got $s")
    assert(s.getBoolean(5), "full separation at n=60 must be significant")
    // Symmetric flip: A high -> U_a = na*nb, effect +1, z sign flips.
    val flip = ids.map(i =>
      (i, if (armOf(i) == 1L) i.toDouble else 1000.0 + i)).toDF("user_id", "value")
    val f = EventAnalytics.mannWhitneyTest(flip, "user_id", "value").collect().head
    assert(f.getDouble(2) == (na * nb).toDouble && f.getDouble(4) == 1.0)
    assert(f.getDouble(3) == -s.getDouble(3), "z must be antisymmetric")
    // All-tied metric: sigma2 = 0 -> z null, not significant, effect 0.
    val tied = ids.map(i => (i, 5.0)).toDF("user_id", "value")
    val t0 = EventAnalytics.mannWhitneyTest(tied, "user_id", "value").collect().head
    assert(t0.isNullAt(3) && !t0.getBoolean(5))
    assert(t0.getDouble(4) == 0.0, s"tied effect must be 0, got $t0")
  }

  test("srmCheck: chi2 identity from arm counts; balanced coin passes, forced skew flags") {
    def armOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) % 2
    }
    val ids = (1L to 200L).toSeq
    val got = EventAnalytics.srmCheck(
      ids.map(i => Tuple1(i)).toDF("user_id"), "user_id").collect().head
    val (na, nb) = (got.getLong(0), got.getLong(1))
    assert(na == ids.count(armOf(_) == 0L) && nb == ids.count(armOf(_) == 1L))
    val want = BigDecimal((na - nb).toDouble * (na - nb) / (na + nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getDouble(2) == want, s"chi2 identity: $got")
    assert(got.getBoolean(3) == (((na - nb).toDouble * (na - nb) / (na + nb)) > 3.841))
    // Forced skew: drop most of arm 1 (simulating a biased logger) —
    // the gate must flag. Keep arm-0 users plus 2 arm-1 users.
    val skewed = ids.filter(armOf(_) == 0L) ++ ids.filter(armOf(_) == 1L).take(2)
    val s = EventAnalytics.srmCheck(
      skewed.map(i => Tuple1(i)).toDF("user_id"), "user_id").collect().head
    assert(s.getBoolean(3), s"90/2 split must flag SRM: $s")
  }

  test("didTest: recovers the exact planted treatment effect; change scores kill user effects") {
    def armOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) % 2
    }
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // Per-user baseline b_i varies wildly (the confound DiD removes);
    // post = pre + trend + effect·arm, trend = 7, effect = 5, plus a
    // small per-user wobble so arm variances are nonzero.
    val ids = (1L to 80L).toSeq
    val rows = ids.flatMap { i =>
      val b = (i % 11).toDouble * 50.0
      val wobble = (i % 3).toDouble * 0.5
      val eff = if (armOf(i) == 1L) 5.0 else 0.0
      Seq((i, ts(5), b), (i, ts(20), b + 7.0 + eff + wobble))
    }.toDF("user_id", "ts", "value")
    val got = EventAnalytics.didTest(rows, "user_id", "value",
      dayofmonth(col("ts")) <= 15).collect().head
    val (na, nb) = (got.getLong(0), got.getLong(1))
    assert(na + nb == 80L && na > 0 && nb > 0)
    // Exact expected DiD from the fixture's change scores.
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val dA = ids.filter(armOf(_) == 0L).map(i => 7.0 + (i % 3).toDouble * 0.5)
    val dB = ids.filter(armOf(_) == 1L).map(i => 12.0 + (i % 3).toDouble * 0.5)
    val want = BigDecimal(mean(dB) - mean(dA))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got.getDouble(6) - want) < 2e-6, s"did: ${got.getDouble(6)} vs $want")
    assert(got.getBoolean(8), "a 5-unit effect on sub-unit wobble must be significant")
    // pre means ignore the arm effect entirely (it lands in post only)
    assert(math.abs(got.getDouble(2) - mean(ids.filter(armOf(_) == 0L)
      .map(i => (i % 11).toDouble * 50.0))) < 1e-6)
  }

  test("fdrAdjust: BH bounds hold; a planted arm-only metric is rejected, noise is not") {
    def armOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) % 2
    }
    val ids = (1L to 120L).toSeq
    // 'everyone' fires for all users (z = 0, p = 1); 'treat_only' fires
    // only in arm 1 (huge |z|, tiny p); 'coin' fires for a user-id
    // parity subset uncorrelated with the md5 arm.
    val rows = ids.flatMap { i =>
      Seq((i, "everyone")) ++
        (if (armOf(i) == 1L) Seq((i, "treat_only")) else Nil) ++
        (if (i % 2 == 0L) Seq((i, "coin")) else Nil)
    }.toDF("user_id", "event_type")
    val got = EventAnalytics.fdrAdjust(rows, "user_id", "event_type")
      .orderBy("metric").collect()
    assert(got.length == 3)
    val byName = got.map(r => r.getString(0) -> r).toMap
    // BH sanity on every row: p in [0,1], p_adj in [p, 1].
    got.foreach { r =>
      val (p, padj) = (r.getDouble(4), r.getDouble(5))
      assert(p >= 0.0 && p <= 1.0 && padj >= p - 1e-9 && padj <= 1.0, s"$r")
    }
    assert(byName("everyone").getDouble(3) == 0.0, "all-converted metric has z = 0")
    assert(byName("everyone").getDouble(4) >= 0.999, "z = 0 must give p ~ 1")
    assert(byName("treat_only").getBoolean(6), "the arm-only metric must be rejected")
    assert(!byName("everyone").getBoolean(6))
    assert(!byName("coin").getBoolean(6), "parity metric is arm-independent noise")
  }

  test("bootstrapTest: degenerate CI on constant metric; planted shift is detected") {
    def armOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) % 2
    }
    val ids = (1L to 100L).toSeq
    // Constant metric: every weighted mean is exactly the constant, so
    // the CI collapses to [0, 0] and nothing is significant.
    val const = ids.map(i => (i, 7.25)).toDF("user_id", "value")
    val c = EventAnalytics.bootstrapTest(const, "user_id", "value").collect().head
    assert(c.getDouble(2) == 7.25 && c.getDouble(3) == 7.25)
    assert(c.getDouble(5) == 0.0 && c.getDouble(6) == 0.0 && !c.getBoolean(7))
    // Planted +50 shift on arm 1 over small per-user wobble: the CI
    // must exclude 0 and bracket the true diff.
    val shifted = ids.map { i =>
      val base = (i % 5).toDouble
      (i, if (armOf(i) == 1L) base + 50.0 else base)
    }.toDF("user_id", "value")
    val s = EventAnalytics.bootstrapTest(shifted, "user_id", "value").collect().head
    assert(s.getBoolean(7), s"a +50 shift must be significant: $s")
    assert(s.getDouble(5) > 40.0 && s.getDouble(6) < 60.0,
      s"CI must bracket the planted 50: $s")
    assert(s.getDouble(5) <= s.getDouble(4) && s.getDouble(4) <= s.getDouble(6),
      "point diff inside the CI")
  }

  test("bootstrapTest: reps = 20 trims one order statistic per tail (no min/max CI)") {
    // Ceil-based trim: reps in [20, 39] reports ranks (2, reps-1), not
    // the replicate min/max. Replay the whole hash-derived bootstrap in
    // plain Scala (md5 arms, md5 exponential weights, exact BigDecimal
    // folds) and pin the operator's CI to the trimmed order statistics.
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def armOf(id: Long): Long = java.lang.Long.parseLong(
      md5hex(s"${id}ab").substring(0, 2), 16) % 2
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val reps = 20
    val ids = (1L to 80L).toSeq
    val users = ids.map(i => (i, r6((i % 11).toDouble), armOf(i)))
    val diffs = (0 until reps).map { r =>
      def mean(arm: Long): Double = {
        val rows = users.filter(_._3 == arm).map { case (u, m, _) =>
          val h52 = java.lang.Long.parseLong(
            md5hex(s"$u#$r").substring(0, 13), 16)
          val w = r6(-math.log((h52.toDouble + 0.5) / 4503599627370496.0))
          (BigDecimal(w) * BigDecimal(m), BigDecimal(w))
        }
        // mirror the engine: exact decimal folds, double DIVISION
        r6(rows.map(_._1).sum.toDouble / rows.map(_._2).sum.toDouble)
      }
      r -> r6(mean(1) - mean(0))
    }
    val sorted = diffs.sortBy { case (r, d) => (d, r) }.map(_._2)
    val got = EventAnalytics
      .bootstrapTest(ids.map(i => (i, (i % 11).toDouble)).toDF("user_id", "value"),
        "user_id", "value", reps = reps)
      .collect().head
    assert(got.getDouble(5) == sorted(1), "lo = rank-2 order statistic")
    assert(got.getDouble(6) == sorted(reps - 2), "hi = rank-(reps-1) order statistic")
    assert(sorted.head < sorted(1) || sorted(reps - 2) < sorted.last,
      "fixture must make the trim observable (an extreme is strictly outside)")
  }

  test("srmDaily: a day whose entrants are all one arm flags; balanced days do not") {
    def armOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) % 2
    }
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-02-$day%02d 09:00:00")
    // Day 1: an EXACTLY balanced cohort (40 ids per arm, picked by the
    // replicated coin — the md5 split of a raw 1..n range can itself
    // exceed the 3.841 gate by chance, which is the gate working).
    // Day 2: only arm-1 users enter — simulate a logger that dropped
    // arm-0 signups that day.
    val pool = (1L to 400L).toSeq
    val ids = pool.filter(armOf(_) == 0L).take(40) ++
      pool.filter(armOf(_) == 1L).take(40)
    val day2Ids = (1001L to 1060L).filter(armOf(_) == 1L)
    val rows = ids.map(i => (i, ts(1))) ++ day2Ids.map(i => (i, ts(2)))
    val got = EventAnalytics.srmDaily(rows.toDF("user_id", "ts"), "user_id", "ts")
      .orderBy("day").collect()
    assert(got.length == 2)
    assert(!got(0).getBoolean(4), s"balanced day 1 must not flag: ${got(0)}")
    assert(got(1).getLong(1) == 0L && got(1).getLong(2) == day2Ids.length.toLong)
    assert(got(1).getBoolean(4), s"one-arm day 2 must flag: ${got(1)}")
  }

  test("balanceCheck: a planted pre-value imbalance flags only that covariate") {
    def armOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) % 2
    }
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    val ids = (1L to 80L).toSeq
    // Two pre-period events per user on days 3 and 7 (same count and
    // active days in both arms), but arm-1 users carry +50 per event —
    // only pre_value should read imbalanced. A small i-dependent wobble
    // keeps variances nonzero.
    val rows = ids.flatMap { i =>
      val bump = if (armOf(i) == 1L) 50.0 else 0.0
      Seq((i, ts(3), 1.0 + (i % 3) * 0.25 + bump),
        (i, ts(7), 2.0 + (i % 5) * 0.25 + bump))
    }.toDF("user_id", "ts", "value")
    val got = EventAnalytics.balanceCheck(rows, "user_id", "ts", "value",
      dayofmonth(col("ts")) <= 15).orderBy("covariate").collect()
    val byCov = got.map(r => r.getString(0) -> r).toMap
    assert(byCov.keySet == Set("pre_value", "pre_events", "pre_days"))
    assert(byCov("pre_value").getBoolean(4), "planted value imbalance must flag")
    assert(byCov("pre_value").getDouble(3) > 5.0, s"SMD of a 100-unit shift over " +
      s"sub-unit wobble must be large: ${byCov("pre_value")}")
    // count/days covariates are identical across arms -> SMD 0 (or null
    // from zero pooled variance), never flagged
    assert(!byCov("pre_events").getBoolean(4) && !byCov("pre_days").getBoolean(4))
  }

  test("funnelAbTest: per-step reach by arm; a step-2-only effect localizes there") {
    def armOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) % 2
    }
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-05 $h%02d:00:00")
    val ids = (1L to 60L).toSeq
    // Everyone views; only arm-1 users click (and then purchase), so
    // the view->click z must fire and carry the whole effect.
    val rows = ids.flatMap { i =>
      Seq((i, ts(1), "view")) ++
        (if (armOf(i) == 1L) Seq((i, ts(2), "click"), (i, ts(3), "purchase"))
         else Nil)
    }.toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelAbTest(rows, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).orderBy("step_idx").collect()
    assert(got.length == 3)
    val na = ids.count(armOf(_) == 0L).toLong
    val nb = ids.count(armOf(_) == 1L).toLong
    val s1 = got(0)
    assert(s1.getLong(2) == na && s1.getLong(3) == nb)
    assert(s1.isNullAt(4) && s1.isNullAt(6) && !s1.getBoolean(7))
    val s2 = got(1)
    assert(s2.getLong(2) == 0L && s2.getLong(3) == nb)
    assert(s2.getDouble(4) == 0.0 && s2.getDouble(5) == 1.0)
    assert(s2.getDouble(6) < -1.96 && s2.getBoolean(7),
      s"full separation at step 2 must be significant: $s2")
    val s3 = got(2)
    // arm 0 reached 0 at step 2 -> step-3 conversion undefined for A
    assert(s3.getLong(2) == 0L && s3.getLong(3) == nb)
    assert(s3.isNullAt(4) && s3.getDouble(5) == 1.0)
    assert(s3.isNullAt(6) && !s3.getBoolean(7))
  }

  test("sequentialTest: always-valid p is monotone; a planted effect stops, null does not") {
    def armOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) % 2
    }
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    val ids = (1L to 60L).toSeq
    // 10 days of activity; arm 1 users are shifted +8 over a small
    // per-(user, day) wobble — a big standardized effect.
    val planted = ids.flatMap { i =>
      (1 to 10).map { d =>
        val base = ((i + d) % 5).toDouble
        (i, ts(d), if (armOf(i) == 1L) base + 8.0 else base)
      }
    }.toDF("user_id", "ts", "value")
    val got = EventAnalytics.sequentialTest(planted, "user_id", "ts", "value")
      .orderBy("day").collect()
    assert(got.length == 10)
    val ps = got.map(_.getDouble(5))
    assert(ps.sliding(2).forall { case Array(a, b) => b <= a + 1e-9; case _ => true },
      s"always-valid p must be non-increasing: ${ps.mkString(",")}")
    assert(got.last.getBoolean(6), s"a +8 shift must stop by day 10: p=${ps.last}")
    // Null: identical distributions in both arms -> no stop.
    val nullCase = ids.flatMap { i =>
      (1 to 10).map { d => (i, ts(d), ((i + d) % 5).toDouble) }
    }.toDF("user_id", "ts", "value")
    val pn = EventAnalytics.sequentialTest(nullCase, "user_id", "ts", "value")
      .orderBy("day").collect()
    assert(!pn.last.getBoolean(6),
      s"identical arms must not stop: p=${pn.last.getDouble(5)}")
  }

  test("powerCheck: hand-computed MDE from the pooled variance") {
    // Metric alternates 0/10 by user parity (independent of the md5
    // arm): pooled stats are exactly computable from the fixture.
    val ids = (1L to 50L).toSeq
    val df = ids.map(i => (i, if (i % 2 == 0L) 10.0 else 0.0))
      .toDF("user_id", "value")
    val got = EventAnalytics.powerCheck(df, "user_id", "value").collect().head
    val (na, nb) = (got.getLong(0), got.getLong(1))
    assert(na + nb == 50L && na > 0 && nb > 0)
    val vals = ids.map(i => if (i % 2 == 0L) 10.0 else 0.0)
    val n = vals.length.toDouble
    val s = vals.sum; val ss = vals.map(v => v * v).sum
    val varP = (n * ss - s * s) / (n * (n - 1.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getDouble(2) == r6(s / n))
    assert(got.getDouble(3) == r6(math.sqrt(varP)))
    val mde = 2.801585 * math.sqrt(varP * (1.0 / na + 1.0 / nb))
    assert(got.getDouble(4) == r6(mde), s"mde: ${got.getDouble(4)} vs ${r6(mde)}")
    assert(got.getDouble(5) == r6(mde / (s / n)))
  }

  test("cupedTest: exact theta on a linear metric, full variance kill, arm-agnostic") {
    def d(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 12:00:00")
    // One pre event (day 5, value i) and one post event (day 20, value
    // 2i + 3) per user: cov/var = 2 EXACTLY, adj = y - 2(x - mean_x) is
    // CONSTANT (= 3 + 2*mean_x), so CUPED removes all metric variance
    // regardless of how the md5 coin splits the users.
    val rows = (1 to 40).flatMap { i =>
      Seq((i.toLong, d(5), i.toDouble), (i.toLong, d(20), 2.0 * i + 3.0))
    }
    val df = rows.toDF("user_id", "ts", "value")
    val got = EventAnalytics.cupedTest(
      df, "user_id", "value", dayofmonth(col("ts")) <= 15).collect().head
    assert(got.getLong(0) + got.getLong(1) == 40L, "all users assigned")
    assert(got.getDouble(4) == 2.0, s"theta ${got.getDouble(4)}")
    assert(got.getDouble(5) == 1.0, s"var_reduction ${got.getDouble(5)}")
    // adj is constant -> se = 0 -> z undefined, not significant
    assert(got.isNullAt(6) && !got.getBoolean(7))
    // adjusted means equal the constant 3 + 2 * 20.5 = 44 on both arms
    assert(got.getDouble(2) == 44.0 && got.getDouble(3) == 44.0)
    // uncorrelated covariate: theta ~ 0, variance reduction ~ 0, and the
    // z verdict matches a plain Welch test on y (CUPED must not bias)
    val flat = (1 to 40).flatMap { i =>
      Seq((i.toLong, d(5), 1.0), (i.toLong, d(20), (i % 7).toDouble))
    }.toDF("user_id", "ts", "value")
    val f = EventAnalytics.cupedTest(
      flat, "user_id", "value", dayofmonth(col("ts")) <= 15).collect().head
    assert(f.getDouble(4) == 0.0, s"constant covariate -> theta 0, got $f")
    assert(math.abs(f.getDouble(5)) < 1e-9, "no covariate signal, no reduction")
  }

  test("cumulativeHazard: hand Nelson-Aalen on the KM fixture; FH survival = exp(-H)") {
    def d(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 12:00:00")
    // Same fixture as the survivalCurve test: risk sets 5,4,3,1 with
    // churn counts 0,1,2,0 at t = 0,1,3,15.
    val df = Seq(
      ("u1", d(1)), ("u1", d(2)),
      ("u2", d(1)), ("u2", d(4)),
      ("u3", d(1)), ("u3", d(4)),
      ("u4", d(5)), ("u4", d(20)),
      ("u5", d(20))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.cumulativeHazard(df, "user_id", "ts", churnGapDays = 7)
      .orderBy("t")
      .select("t", "n_risk", "n_churn", "hazard", "survival_fh")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // H: 0, then 1/4, then 1/4 + round12(2/3) = 0.916666666667 -> 6dp.
    val h1 = 0.25
    val h3 = 0.916667
    assert(got.map(x => (x._1, x._2, x._3)) ==
      Seq((0, 5L, 0L), (1, 4L, 1L), (3, 3L, 2L), (15, 1L, 0L)))
    assert(got(0)._4 == 0.0 && got(0)._5 == 1.0)
    assert(got(1)._4 == h1, s"H(1) = ${got(1)._4}")
    assert(got(2)._4 == h3 && got(3)._4 == h3, s"H(3) = ${got(2)._4}")
    got.foreach { x => assert(x._5 == r6(math.exp(-x._4)), s"FH at t=${x._1}") }
    // hazard non-decreasing, FH survival within (0, 1] and >= KM
    assert(got.map(_._4).sliding(2).forall {
      case Seq(a, b) => b >= a; case _ => true })
    val km = EventAnalytics.survivalCurve(df, "user_id", "ts", churnGapDays = 7)
      .orderBy("t").select("survival").as[Double].collect()
    got.map(_._5).zip(km).foreach { case (fh, k) =>
      assert(fh >= k - 1e-9, s"FH ($fh) must dominate KM ($k)") }
  }

  test("giniConcentration: 0 for equal values, (n-1)/n when one row owns all") {
    val equal = (1 to 10).map(_ => ("e", 5.0)).toDF("grp", "v")
    val g0 = EventAnalytics.giniConcentration(equal, "grp", "v")
      .select("gini").as[Double].collect().head
    assert(g0 == 0.0)
    // One row owns everything: G = (n-1)/n = 0.9 for n = 10.
    val mono = ((1 to 9).map(_ => ("m", 0.0)) :+ (("m", 100.0))).toDF("grp", "v")
    val g1 = EventAnalytics.giniConcentration(mono, "grp", "v")
      .select("gini").as[Double].collect().head
    assert(math.abs(g1 - 0.9) < 1e-9, s"one-owner gini: $g1")
    // Ties are rank-invariant: shuffled duplicates give the same value.
    val dup = Seq(("t", 1.0), ("t", 3.0), ("t", 3.0), ("t", 3.0), ("t", 8.0))
    val a = EventAnalytics.giniConcentration(dup.toDF("grp", "v"), "grp", "v")
      .select("gini").as[Double].collect().head
    val b = EventAnalytics.giniConcentration(
        dup.reverse.toDF("grp", "v"), "grp", "v")
      .select("gini").as[Double].collect().head
    assert(a == b)
    // Negative and null values are excluded; all-zero groups drop.
    val z = Seq(("z", 0.0), ("z", 0.0)).toDF("grp", "v")
    assert(EventAnalytics.giniConcentration(z, "grp", "v").count() == 0)
  }

  test("rfmScores: recency reversed, buckets monotone in each dimension") {
    def d(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 12:00:00")
    // 10 users: user k has its last event on day k, k events, value 10*k
    // each — perfectly rank-correlated dimensions, recency reversed.
    val df = (1 to 10).flatMap { k =>
      (1 to k).map(_ => (f"u$k%02d", d(k), 10.0 * k))
    }.toDF("user_id", "ts", "v")
    val got = EventAnalytics.rfmScores(df, "user_id", "ts", "v")
      .orderBy("user_id")
      .select("user_id", "recency_days", "frequency", "r_score", "f_score", "m_score", "rfm")
      .collect()
    // Later last-day = smaller recency = HIGHER r_score; more events =
    // higher f_score; bigger values = higher m_score — all monotone.
    val rs = got.map(r => r.getInt(r.fieldIndex("r_score")))
    val fs = got.map(r => r.getInt(r.fieldIndex("f_score")))
    val ms = got.map(r => r.getInt(r.fieldIndex("m_score")))
    assert(rs.sameElements(rs.sorted), s"r_score monotone up: ${rs.mkString(",")}")
    assert(fs.sameElements(fs.sorted), s"f_score monotone up: ${fs.mkString(",")}")
    assert(ms.sameElements(ms.sorted), s"m_score monotone up: ${ms.mkString(",")}")
    // Quintiles span the full 1..5 range on 10 evenly-ranked users.
    assert(rs.min == 1 && rs.max == 5 && ms.min == 1 && ms.max == 5)
    // The rfm code is the concatenated digits.
    val top = got.last
    assert(top.getString(top.fieldIndex("rfm")) ==
      s"${top.getInt(top.fieldIndex("r_score"))}${top.getInt(top.fieldIndex("f_score"))}${top.getInt(top.fieldIndex("m_score"))}")
    // u10 (most recent, most active, biggest spend) is 555; recency 0.
    assert(top.getString(0) == "u10")
    assert(top.getInt(top.fieldIndex("recency_days")) == 0)
    assert(top.getString(top.fieldIndex("rfm")) == "555")
  }

  test("sessionize: gap boundary is strict, indexes are 1-based per user") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 10:30:00")), // gap = 1800 exactly -> SAME session
      (3L, "a", ts("2024-01-01 11:00:01")), // gap = 1801 -> new session
      (4L, "b", ts("2024-01-01 10:00:00")) // other user restarts at 1
    ).toDF("event_id", "user_id", "ts")
    val got = EventAnalytics.sessionize(df, "user_id", "ts", 1800L, col("event_id"))
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    intercept[IllegalArgumentException] {
      EventAnalytics.sessionize(df, "user_id", "ts", 0L, col("event_id"))
    }
  }

  test("sessionStats: duration and counts per session") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 10:10:00")),
      (3L, "a", ts("2024-01-01 12:00:00")) // new session, single event
    ).toDF("event_id", "user_id", "ts")
    val got = EventAnalytics.sessionStats(df, "user_id", "ts", 1800L, col("event_id"))
      .select("session_idx", "duration_sec", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 600L, 2L), (2L, 0L, 1L)))
  }

  test("transitionMatrix: cross-session pairs excluded, rows normalize to 1") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), "view"),
      (2L, "a", ts("2024-01-01 10:01:00"), "click"),
      (3L, "a", ts("2024-01-01 10:02:00"), "view"),
      // 2h gap: the view->view pair across it must NOT count
      (4L, "a", ts("2024-01-01 12:30:00"), "view"),
      (5L, "a", ts("2024-01-01 12:31:00"), "click"),
      (6L, "b", ts("2024-01-01 09:00:00"), "view"),
      (7L, "b", ts("2024-01-01 09:05:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.transitionMatrix(df, "user_id", "ts", "event_type",
        1800L, col("event_id"))
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == Map(
      ("view", "click") -> (2L, 0.666667),
      ("view", "purchase") -> (1L, 0.333333),
      ("click", "view") -> (1L, 1.0)))
  }

  test("transitionMatrix2: squares the one-step matrix, absorbing states vanish") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), "view"),
      (2L, "a", ts("2024-01-01 10:01:00"), "click"),
      (3L, "a", ts("2024-01-01 10:02:00"), "view"),
      (4L, "a", ts("2024-01-01 12:30:00"), "view"),
      (5L, "a", ts("2024-01-01 12:31:00"), "click"),
      (6L, "b", ts("2024-01-01 09:00:00"), "view"),
      (7L, "b", ts("2024-01-01 09:05:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    // One-step: view->click 0.666667, view->purchase 0.333333,
    // click->view 1.0. Purchase is absorbing (no out row), so no
    // two-step path goes THROUGH it.
    val got = EventAnalytics.transitionMatrix2(df, "user_id", "ts",
        "event_type", 1800L, col("event_id"))
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      ("view", "view") -> 0.666667,
      ("click", "click") -> 0.666667,
      ("click", "purchase") -> 0.333333))
  }

  test("abTest: z matches the pooled formula; degenerate cases stay null") {
    // 400 users, conversion decided per user so the arm split is
    // whatever the md5 coin says; recompute the expected z from the
    // pooled formula on the OBSERVED arm counts.
    val users = (1L to 400L)
    val df = users.flatMap(u => Seq(
      (u, if (u % 4 == 0) "purchase" else "view"),
      (u, "click"))).toDF("user_id", "event_type")
    val r = EventAnalytics.abTest(df, "user_id",
      col("event_type") === "purchase").collect().head
    val (na, ka) = (r.getLong(0), r.getLong(1))
    val (nb, kb) = (r.getLong(3), r.getLong(4))
    assert(na + nb == 400L && ka + kb == 100L)
    val (nA, nB) = (na.toDouble, nb.toDouble)
    val (pa, pb) = (ka / nA, kb / nB)
    val pp = (ka + kb).toDouble / (nA + nB)
    val se = math.sqrt(pp * (1.0 - pp) * (1.0 / nA + 1.0 / nB))
    val zExp = BigDecimal((pa - pb) / se)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(r.fieldIndex("z")) == zExp)
    assert(r.getBoolean(r.fieldIndex("significant")) == (math.abs((pa - pb) / se) > 1.96))
    // Everyone converts: pooled variance 0 -> null z, not-significant.
    val all = users.map(u => (u, "purchase")).toDF("user_id", "event_type")
    val r2 = EventAnalytics.abTest(all, "user_id",
      col("event_type") === "purchase").collect().head
    assert(r2.isNullAt(r2.fieldIndex("z")))
    assert(!r2.getBoolean(r2.fieldIndex("significant")))
  }

  test("funnelLatency: exact lower-median and p90 at integer ranks") {
    // Four users convert view->click in 10/20/30/40s: lower median is
    // rank floor((4+1)/2)=2 -> 20, p90 is rank floor((36+9)/10)=4 -> 40.
    // One user converts click->purchase in 5s: both quantiles = 5.
    val rows = Seq(
      ("u1", 0, "view"), ("u1", 10, "click"),
      ("u2", 0, "view"), ("u2", 20, "click"),
      ("u3", 0, "view"), ("u3", 30, "click"),
      ("u4", 0, "view"), ("u4", 40, "click"), ("u4", 45, "purchase"),
      ("u5", 0, "view") // never clicks: no latency row
    ).map { case (u, s, t) =>
      (u, new java.sql.Timestamp(1700000000000L + s * 1000L), t)
    }.toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelLatency(rows, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .select("step_from", "step_to", "n", "median_sec", "p90_sec")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("view", "click", 4L, 20L, 40L),
      ("click", "purchase", 1L, 5L, 5L)))
  }

  test("rateWilson: known interval values, bounds inside [0,1]") {
    // Day 1: 4 events, 1 purchase (p = 0.25). Wilson 95%:
    // z2n = 3.8416/4 = 0.9604; denom = 1.9604
    // center = (0.25 + 0.4802)/1.9604 = 0.37247...
    // half = 1.96*sqrt(0.25*0.75/4 + 0.9604/16)/1.9604 = 0.32358...
    val df = Seq(
      ("purchase", ts("2024-01-01 10:00:00")),
      ("view", ts("2024-01-01 11:00:00")),
      ("view", ts("2024-01-01 12:00:00")),
      ("click", ts("2024-01-01 13:00:00")),
      // Day 2: all purchases -> rate 1, hi must clamp below 1.
      ("purchase", ts("2024-01-02 10:00:00")),
      ("purchase", ts("2024-01-02 11:00:00"))
    ).toDF("event_type", "ts")
    val got = EventAnalytics.rateWilson(df, "ts", col("event_type") === "purchase")
      .orderBy("day").collect()
    val d1 = got(0)
    assert(d1.getLong(d1.fieldIndex("n")) == 4L)
    assert(d1.getLong(d1.fieldIndex("k")) == 1L)
    assert(d1.getDouble(d1.fieldIndex("rate")) == 0.25)
    assert(math.abs(d1.getDouble(d1.fieldIndex("wilson_lo")) - 0.045586) < 1e-6)
    assert(math.abs(d1.getDouble(d1.fieldIndex("wilson_hi")) - 0.699364) < 1e-6)
    val d2 = got(1)
    assert(d2.getDouble(d2.fieldIndex("rate")) == 1.0)
    assert(d2.getDouble(d2.fieldIndex("wilson_hi")) <= 1.0)
    assert(d2.getDouble(d2.fieldIndex("wilson_lo")) > 0.0
      && d2.getDouble(d2.fieldIndex("wilson_lo")) < 1.0,
      "2-of-2 must not claim certainty")
  }

  test("topPaths: depth-truncated per-session paths with global shares") {
    val df = Seq(
      // session 1 of user a has FOUR events: the path must stop at 3.
      (1L, "a", ts("2024-01-01 10:00:00"), "view"),
      (2L, "a", ts("2024-01-01 10:01:00"), "click"),
      (3L, "a", ts("2024-01-01 10:02:00"), "view"),
      (4L, "a", ts("2024-01-01 10:03:00"), "purchase"),
      // 2h gap -> session 2, a two-event path
      (5L, "a", ts("2024-01-01 12:30:00"), "view"),
      (6L, "a", ts("2024-01-01 12:31:00"), "click"),
      (7L, "b", ts("2024-01-01 09:00:00"), "view"),
      (8L, "b", ts("2024-01-01 09:05:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.topPaths(df, "user_id", "ts", "event_type",
        1800L, col("event_id"), depth = 3)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "view>click>view" -> (1L, 0.333333),
      "view>click" -> (1L, 0.333333),
      "view>purchase" -> (1L, 0.333333)))
    // Same-timestamp events order by the tie-break, not arrival.
    val tie = Seq(
      (2L, "u", ts("2024-01-01 10:00:00"), "late"),
      (1L, "u", ts("2024-01-01 10:00:00"), "early")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val p = EventAnalytics.topPaths(tie, "user_id", "ts", "event_type",
        1800L, col("event_id"), depth = 3)
      .select("path").as[String].collect().toSeq
    assert(p == Seq("early>late"))
  }
}
