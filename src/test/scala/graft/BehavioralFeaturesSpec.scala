package graft

import java.sql.Timestamp

import graft.operators.{BehavioralFeatures, SilverTransform}

/** Hand-computed micro-fixtures for the range-window semantics that are
  * the core of the reference (SURVEY §2.5): value-range frames on unix
  * seconds, current row inclusive, ties share frames.
  */
class BehavioralFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private lazy val fixture = Seq(
    // (transaction_id, sender_account, receiver_account, amount, timestamp)
    ("t1", "A", "r1", 100.0, ts(0)),
    ("t2", "A", "r2", 200.0, ts(1800)),
    ("t3", "A", "r1", 300.0, ts(3599)),
    ("t4", "A", "r3", 400.0, ts(3601)),
    ("t5", "A", "r1", 500.0, ts(90000)),
    ("t6", "B", "r9", 50.0, ts(1800))   // other account: never mixed in
  ).toDF("transaction_id", "sender_account", "receiver_account", "amount", "timestamp")

  private lazy val feats = BehavioralFeatures.addFeatures(fixture)
    .select("transaction_id", "velocity_1h", "avg_diff_24h", "merchant_diversity")
    .collect().map(r => r.getString(0) -> r).toMap

  test("velocity_1h: trailing 3600s count, inclusive of current row") {
    assert(feats("t1").getLong(1) == 1)
    assert(feats("t2").getLong(1) == 2)
    assert(feats("t3").getLong(1) == 3)    // 0,1800,3599 all within [-1,3599]... [3599-3600,3599]
    assert(feats("t4").getLong(1) == 3)    // frame [1,3601]: t2,t3,t4
    assert(feats("t5").getLong(1) == 1)    // nothing within trailing hour
    assert(feats("t6").getLong(1) == 1)    // account B isolated
  }

  test("avg_diff_24h: deviation from trailing 24h mean") {
    // t3: mean(100,200,300)=200 -> 300-200=100
    assert(math.abs(feats("t3").getDouble(2) - 100.0) < 1e-9)
    // t5 at 90000s: frame [3600,90000] -> only t4(400),t5(500): mean 450 -> 50
    assert(math.abs(feats("t5").getDouble(2) - 50.0) < 1e-9)
  }

  test("merchant_diversity: distinct receivers in trailing 6h") {
    assert(feats("t4").getInt(3) == 3)     // r1,r2,r3 within 21600s
    assert(feats("t5").getInt(3) == 1)
  }

  test("window features are invariant to input row order") {
    val shuffled = BehavioralFeatures.addFeatures(fixture.orderBy($"amount".desc))
      .select("transaction_id", "velocity_1h", "avg_diff_24h", "merchant_diversity")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(feats.keySet.forall(k => shuffled(k) == feats(k).toSeq.drop(1)))
  }

  test("silver transform derives temporal columns and chrono split partitions the set") {
    val silver = SilverTransform.transform(
      Seq(("t1", Timestamp.valueOf("2023-10-14 23:30:00"), true, null.asInstanceOf[String]),
          ("t2", Timestamp.valueOf("2023-10-21 09:00:00"), false, "x"))
        .toDF("transaction_id", "timestamp", "is_fraud", "fraud_type"))
    val rows = silver.select("transaction_id", "txn_hour", "txn_day_of_week", "is_weekend", "label", "fraud_type")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("t1").getInt(1) == 23)
    assert(rows("t1").getInt(2) == 7 && rows("t1").getInt(3) == 1) // Saturday=7, weekend
    assert(rows("t1").getInt(4) == 1)                              // fraud -> 1
    assert(rows("t1").getString(5) == "none")                      // fillna
    assert(rows("t2").getInt(3) == 1 && rows("t2").getInt(2) == 7) // 2023-10-21 is Saturday

    val (train, test) = SilverTransform.chronoSplit(silver, Timestamp.valueOf("2023-10-20 12:00:00"))
    assert(train.count() + test.count() == 2)
    assert(train.select("transaction_id").as[String].collect().toSet == Set("t1"))
  }

  // ---- Blocked (skew-proof) trailing windows: the contract is exact
  // ---- identity with the plain RANGE window on every fixture.

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.{col, unix_timestamp}

  /** Hand-placed edges: rows exactly W seconds apart (inclusive frame),
    * ties AT a block boundary (ts = k*W shared by several rows), a row
    * one past the boundary, and a second key interleaved.
    */
  private lazy val edgeRows = Seq(
    // (id, key, ts_sec, value, tag)
    (1L, "A", 0L, 10.0, "x"),
    (2L, "A", 3600L, 20.0, "y"),    // exactly W after id=1: frame [0,3600] includes both
    (3L, "A", 3600L, 30.0, "x"),    // tie at the block boundary (block 1 start)
    (4L, "A", 3601L, 40.0, "z"),    // frame [1,3601]: ids 2,3,4 only
    (5L, "A", 7199L, 50.0, "y"),    // end of block 1: frame [3599,7199] -> 2,3,4,5
    (6L, "A", 7200L, 60.0, "x"),    // block 2 start: frame [3600,7200] -> 2,3,4,5,6
    (7L, "A", 99999L, 70.0, "q"),   // far future: alone in frame
    (8L, "B", 3600L, 80.0, "x"),    // other key, same boundary ts
    (9L, "B", 3650L, 90.0, "x")
  ).toDF("id", "key", "ts_unix", "value", "tag")

  /** A hot key: 600 rows in one hour for key H (all in 2 blocks), and a
    * sparse key S spanning many blocks (probe must skip empty blocks).
    */
  private lazy val hotRows = {
    val hot = (0 until 600).map(i => (100L + i, "H", i * 6L, (i % 7).toDouble, s"t${i % 5}"))
    val sparse = Seq(
      (900L, "S", 0L, 1.0, "a"),
      (901L, "S", 50000L, 2.0, "b"),   // blocks away from 900: no prev-block match
      (902L, "S", 53599L, 3.0, "a"),   // within W of 901 (3599s), adjacent block
      (903L, "S", 53600L, 4.0, "c"))   // exactly W after 901
    (hot ++ sparse).toDF("id", "key", "ts_unix", "value", "tag")
  }

  private def assertBlockedEqualsPlain(df: DataFrame, seconds: Long): Unit = {
    val plainCount = df.select(col("id"),
      BehavioralFeatures.trailingCount("key", "ts_unix", seconds).as("c"))
    val blockedCount = BehavioralFeatures
      .blockedTrailingCount(df, "key", "ts_unix", seconds, "c")
      .select("id", "c")
    assert(blockedCount.exceptAll(plainCount).isEmpty && plainCount.exceptAll(blockedCount).isEmpty,
      s"blocked count != plain count at W=$seconds")

    val plainAvg = df.select(col("id"),
      BehavioralFeatures.trailingAvgExact(col("value"), "key", "ts_unix", seconds).as("a"))
    val blockedAvg = BehavioralFeatures
      .blockedTrailingAvgExact(df, "value", "key", "ts_unix", seconds, "a")
      .select("id", "a")
    assert(blockedAvg.exceptAll(plainAvg).isEmpty && plainAvg.exceptAll(blockedAvg).isEmpty,
      s"blocked avg != plain avg at W=$seconds (must be bit-equal, decimal partials)")

    val plainDist = df.select(col("id"),
      BehavioralFeatures.trailingDistinct(col("tag"), "key", "ts_unix", seconds).as("d"))
    val blockedDist = BehavioralFeatures
      .blockedTrailingDistinct(df, "tag", "key", "ts_unix", seconds, "d")
      .select("id", "d")
    assert(blockedDist.exceptAll(plainDist).isEmpty && plainDist.exceptAll(blockedDist).isEmpty,
      s"blocked distinct != plain distinct at W=$seconds")
  }

  test("blocked windows: ties at block boundaries and exact-W probes match the plain window") {
    assertBlockedEqualsPlain(edgeRows, 3600L)
  }

  test("trailing avg keeps sub-cent precision (decimal(38,12), no per-row rounding)") {
    // Values with >2 decimal places: a money-scale decimal(18,2) cast
    // would round 0.001 -> 0.00 per ROW before summing and report 0.0.
    val df = Seq(
      (1L, "K", 0L, 0.001),
      (2L, "K", 10L, 0.003),
      (3L, "K", 20L, 0.002)
    ).toDF("id", "key", "ts_unix", "value")
    val out = df.select(col("id"),
      BehavioralFeatures.trailingAvgExact(col("value"), "key", "ts_unix", 3600L).as("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.001)
    assert(out(2L) == 0.002)          // (0.001+0.003)/2 exactly
    assert(out(3L) == 0.002)          // (0.001+0.003+0.002)/3 exactly
    // And a huge value must not overflow to null and drop out of the sum.
    val big = Seq((1L, "K", 0L, 1.0e20), (2L, "K", 10L, 1.0e20))
      .toDF("id", "key", "ts_unix", "value")
    val bigOut = big.select(col("id"),
      BehavioralFeatures.trailingAvgExact(col("value"), "key", "ts_unix", 3600L).as("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bigOut(2L) == 1.0e20, "values beyond money scale must survive the cast")
    // Blocked path agrees on both fixtures.
    assertBlockedEqualsPlain(df.withColumn("tag", org.apache.spark.sql.functions.lit("x")), 15L)
  }

  test("blocked windows: hot key and sparse multi-block key match the plain window") {
    assertBlockedEqualsPlain(hotRows, 3600L)
    assertBlockedEqualsPlain(hotRows, 120L)   // narrow W: hot key spans 30 blocks
  }

  test("blocked count: hand-checked hot-key values (inclusive [t-W, t], RANGE ties)") {
    val out = BehavioralFeatures
      .blockedTrailingCount(hotRows, "key", "ts_unix", 3600L, "c")
      .select("id", "c").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(100L) == 1)          // first hot row
    assert(out(699L) == 600)        // last hot row at ts=3594: all 600 within [.. - 3600, 3594]
    assert(out(901L) == 1)          // sparse: 50000-3600=46400 > 0, id 900 expired
    assert(out(902L) == 2)          // 53599-3600=49999 <= 50000: id 901 in frame
    assert(out(903L) == 3)          // exactly W back: [50000,53600] -> 901 inclusive, 902, self
  }

  test("blocked windows: rows exactly W seconds back are inclusive (edge fixture)") {
    val out = BehavioralFeatures
      .blockedTrailingCount(edgeRows, "key", "ts_unix", 3600L, "c")
      .select("id", "c").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) == 3 && out(3L) == 3)  // ties share the frame: [0,3600] has ids 1,2,3
    assert(out(4L) == 3)                  // [1,3601]: ids 2,3,4 (id 1 expired)
    assert(out(6L) == 5)                  // [3600,7200]: ids 2,3,4,5,6
    assert(out(7L) == 1)
  }

  test("blocked windows: pseudo-random fixture (ties, clustered + spread keys) matches plain") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val key = s"k${rng.nextInt(5)}"
      // Mix of clustered (many ties, short spans) and spread timestamps.
      val t = if (rng.nextBoolean()) rng.nextInt(400).toLong else rng.nextInt(5000).toLong
      (i.toLong, key, t, rng.nextInt(1000) / 10.0, s"v${rng.nextInt(8)}")
    }.toDF("id", "key", "ts_unix", "value", "tag")
    assertBlockedEqualsPlain(rows, 100L)
    assertBlockedEqualsPlain(rows, 997L)   // width coprime to the data span
  }

  test("batch sessionization: gap starts a new session; ties share one; stats summarize") {
    val ev = Seq(
      (1L, "A", 0L), (2L, "A", 100L), (3L, "A", 100L),  // ties share session 0
      (4L, "A", 2000L),                                  // 1900s > 1800 gap -> session 1
      (5L, "A", 3700L), (6L, "A", 5501L),                // 1700 keeps, 1801 breaks
      (7L, "B", 0L)                                      // keys independent
    ).toDF("id", "key", "ts_unix")
    val idx = BehavioralFeatures.sessionIndex(ev, "key", "ts_unix", 1800L)
      .select("id", "session_idx").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 2L, 7L -> 0L))

    val stats = BehavioralFeatures.sessionStats(ev, "key", "ts_unix", 1800L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(stats(("A", 0L)) == (3L, 0L, 100L, 100L))
    assert(stats(("A", 1L)) == (2L, 2000L, 3700L, 1700L))
    assert(stats(("A", 2L)) == (1L, 5501L, 5501L, 0L))
    assert(stats(("B", 0L)) == (1L, 0L, 0L, 0L))
  }

  test("addFeaturesBlocked is bit-identical to addFeatures (pipeline-level, hot key + edges)") {
    // Transactions-shaped data with a hot account (one key, dense
    // minute-grain traffic spanning several 1h/6h blocks) plus the
    // hand-placed edge fixture's shapes: exact-W gaps and boundary ties.
    val rng = new scala.util.Random(11)
    val hot = (0 until 400).map { i =>
      (s"h$i", "HOT", s"r${rng.nextInt(6)}", rng.nextInt(100000) / 100.0, ts(i * 61L))
    }
    val sparse = Seq(
      ("s1", "S", "r1", 100.0, ts(0)),
      ("s2", "S", "r2", 200.0, ts(3600)),    // exactly W after s1
      ("s3", "S", "r2", 300.0, ts(3600)),    // tie at block boundary
      ("s4", "S", "r3", 400.0, ts(90000)))   // far future, everything expired
    val txns = (hot ++ sparse)
      .toDF("transaction_id", "sender_account", "receiver_account", "amount", "timestamp")

    val plain = BehavioralFeatures.addFeatures(txns)
    val blocked = BehavioralFeatures.addFeaturesBlocked(txns)
    assert(plain.columns.toSeq == blocked.columns.toSeq,
      "blocked variant must keep addFeatures' exact schema")
    assert(blocked.exceptAll(plain).isEmpty && plain.exceptAll(blocked).isEmpty,
      "addFeaturesBlocked must be bit-identical to addFeatures (decimal partials)")
  }

  test("blocked windows reject non-positive width") {
    intercept[IllegalArgumentException] {
      BehavioralFeatures.blockedTrailingCount(edgeRows, "key", "ts_unix", 0L, "c")
    }
  }
}
