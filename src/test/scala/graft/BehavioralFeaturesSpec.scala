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
}
