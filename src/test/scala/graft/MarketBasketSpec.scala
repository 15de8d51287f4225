package graft

import graft.operators.MarketBasket

class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  test("pairStats: counts, cosine, lift, confidence on a hand basket set") {
    // 4 baskets: {x,y} twice, {x,z}, {y} — so n_x=3, n_y=3, n_z=1,
    // n_xy=2, n_xz=1 (below minPairCount). Duplicate rows in a basket
    // must dedup before counting.
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")
    ).toDF("basket", "item")
    val got = MarketBasket.pairStats(df, "basket", "item", minPairCount = 2L)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(r.fieldIndex("item_a")) == "x")
    assert(r.getString(r.fieldIndex("item_b")) == "y")
    assert(r.getLong(r.fieldIndex("n_ab")) == 2L)
    assert(r.getLong(r.fieldIndex("n_a")) == 3L)
    assert(r.getLong(r.fieldIndex("n_b")) == 3L)
    // cosine = 2/sqrt(9) = 0.666667; lift = 2*4/9 = 0.888889;
    // conf both ways = 2/3.
    assert(r.getDouble(r.fieldIndex("cosine")) == 0.666667)
    assert(r.getDouble(r.fieldIndex("lift")) == 0.888889)
    assert(r.getDouble(r.fieldIndex("conf_a_b")) == 0.666667)
    assert(r.getDouble(r.fieldIndex("conf_b_a")) == 0.666667)
  }

  test("topRecommendations: symmetrized ranks with deterministic tie-break") {
    val pairs = Seq(
      ("x", "y", 2L, 3L, 3L, 0.9, 1.0, 0.6, 0.6),
      ("x", "z", 2L, 3L, 2L, 0.8, 1.0, 0.6, 1.0),
      ("y", "z", 2L, 3L, 2L, 0.9, 1.0, 0.6, 1.0)
    ).toDF("item_a", "item_b", "n_ab", "n_a", "n_b",
      "cosine", "lift", "conf_a_b", "conf_b_a")
    val top1 = graft.operators.MarketBasket.topRecommendations(pairs, k = 1)
      .select("item", "rec").as[(String, String)].collect().toMap
    // y ties between x and z at 0.9 -> the smaller partner wins.
    assert(top1 == Map("x" -> "y", "y" -> "x", "z" -> "y"))
    val all = graft.operators.MarketBasket.topRecommendations(pairs, k = 5)
      .collect()
    assert(all.length == 6, "every pair appears in both directions")
  }

  test("pairStats: pair order is canonical (a < b) and complete") {
    // One basket of 4 items must emit all C(4,2)=6 ordered pairs.
    val df = (Seq("d", "b", "a", "c")).zipWithIndex
      .map { case (i, _) => (1L, i) }.toDF("basket", "item")
    val got = MarketBasket.pairStats(df, "basket", "item", minPairCount = 1L)
      .select("item_a", "item_b").as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
    assert(got.forall { case (a, b) => a < b })
  }

  test("pairStats: maxBasketSize identity at no-op cap; viral basket dropped entirely") {
    // 3 normal baskets plus one "viral" 5-item basket.
    val df = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (9L, "x"), (9L, "y"), (9L, "z"), (9L, "u"), (9L, "v")
    ).toDF("basket", "item")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("item_a", "item_b").collect().map(_.toSeq).toSeq
    val uncapped = MarketBasket.pairStats(df, "basket", "item", minPairCount = 1L)
    // A cap no basket exceeds is bitwise identical to the uncapped run.
    val noop = MarketBasket.pairStats(df, "basket", "item",
      minPairCount = 1L, maxBasketSize = 5)
    assert(rows(noop) == rows(uncapped))
    // Capping at 4 drops basket 9 from EVERYTHING: pair counts, item
    // census, and N — identical to mining the corpus without it.
    val capped = MarketBasket.pairStats(df, "basket", "item",
      minPairCount = 1L, maxBasketSize = 4)
    val without = MarketBasket.pairStats(df.filter($"basket" =!= 9L),
      "basket", "item", minPairCount = 1L)
    assert(rows(capped) == rows(without))
    // u/v exist only in the viral basket -> absent from the capped output.
    val items = capped.select("item_a").union(capped.select("item_b"))
      .as[String].collect().toSet
    assert(!items.contains("u") && !items.contains("v"))
  }
}
