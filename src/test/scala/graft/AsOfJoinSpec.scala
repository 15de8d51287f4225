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

  test("forward direction picks earliest right row at-or-after, lowest id on ties") {
    val joined = AsOfJoin.join(
      trades, quotes, "sym", "sym", "tts", "qts",
      rightPayload = Seq("quote_id", "price"), rightOrderCol = "quote_id",
      direction = "forward")
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(joined == Map(
      "t1" -> (1L, 10.0),   // first quote at-or-after ts 50 is quote 1
      "t2" -> (2L, 20.0),   // equal-ts tie: LOWEST quote_id wins forward
      "t3" -> (4L, 40.0),   // next quote after 399
      "t4" -> (4L, 40.0)))  // equal ts matches
    // t5 (after all B quotes) and t6 (no C quotes) unmatched
  }

  test("nearest direction picks the closer side, backward on ties") {
    val joined = AsOfJoin.join(
      trades, quotes, "sym", "sym", "tts", "qts",
      rightPayload = Seq("quote_id", "price"), rightOrderCol = "quote_id",
      direction = "nearest")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(joined("t1") == 1L)  // only forward exists
    assert(joined("t2") == 3L)  // distance 0 backward beats distance 0 forward
    assert(joined("t3") == 4L)  // 399: back quote at 200 (d=199) vs fwd 400 (d=1)
    assert(joined("t5") == 5L)  // only backward exists
  }

  test("tolerance bounds the match distance in every direction") {
    val joined = AsOfJoin.join(
      trades, quotes, "sym", "sym", "tts", "qts",
      rightPayload = Seq("quote_id", "price"), rightOrderCol = "quote_id",
      direction = "backward", toleranceSeconds = Some(10L))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // only the equal-ts matches survive a 10s tolerance
    assert(joined == Map("t2" -> 3L, "t4" -> 4L))
  }

  test("directions agree with the independent inequality-join oracle on events x orders") {
    val events = graft.sources.TableIO.table(spark, Sf0001, "events")
      .select("event_id", "user_id", "ts")
    val orders = graft.sources.TableIO.table(spark, Sf0001, "orders")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._

    val fwd = AsOfJoin.join(
      events, orders, "user_id", "o_custkey", "ts", "o_orderdate",
      rightPayload = Seq("o_orderkey"), rightOrderCol = "o_orderkey",
      direction = "forward")
      .select("event_id", "o_orderkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val w = Window.partitionBy("event_id")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val oracle = events.join(orders,
        col("o_custkey") === col("user_id") && col("o_orderdate") >= col("ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "o_orderkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fwd == oracle)
  }
}
