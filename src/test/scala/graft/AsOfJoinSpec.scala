package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val quotes = Seq(
    // key, quote_ts, quote_id, price
    ("A", ts(100), 1L, 10.0),
    ("A", ts(200), 2L, 20.0),
    ("A", ts(200), 3L, 25.0),  // same timestamp: higher quote_id must win
    ("A", ts(400), 4L, 40.0),
    ("B", ts(150), 5L, 99.0)
  ).toDF("sym", "qts", "quote_id", "price")

  private lazy val trades = Seq(
    ("t1", "A", ts(50)),    // before any quote -> unmatched
    ("t2", "A", ts(200)),   // tie: equal-ts quote matches, id 3 wins
    ("t3", "A", ts(399)),   // latest <= is quote 3
    ("t4", "A", ts(400)),   // equal ts again -> quote 4
    ("t5", "B", ts(1000)),  // different key
    ("t6", "C", ts(500))    // key with no quotes -> unmatched
  ).toDF("trade_id", "sym", "tts")

  test("as-of join picks latest right row at-or-before, per key, deterministic ties") {
    val joined = AsOfJoin.join(
      trades, quotes, "sym", "sym", "tts", "qts",
      rightPayload = Seq("quote_id", "price"), rightOrderCol = "quote_id")
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(joined == Map(
      "t2" -> (3L, 25.0),
      "t3" -> (3L, 25.0),
      "t4" -> (4L, 40.0),
      "t5" -> (5L, 99.0)))
  }

  test("keepUnmatched retains left rows with null payload") {
    val joined = AsOfJoin.join(
      trades, quotes, "sym", "sym", "tts", "qts",
      rightPayload = Seq("quote_id", "price"), rightOrderCol = "quote_id",
      keepUnmatched = true)
    assert(joined.count() == 6)
    val unmatched = joined.filter("quote_id IS NULL")
      .select("trade_id").as[String].collect().toSet
    assert(unmatched == Set("t1", "t6"))
  }
}
