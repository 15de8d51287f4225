package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair mining: for every pair of items that co-occur in
  * at least `minPairCount` baskets, the co-occurrence count plus the
  * association measures a recommender or merchandising pipeline reads —
  * cosine n_ab/√(n_a·n_b), lift n_ab·N/(n_a·n_b), and both directed
  * confidences n_ab/n_a, n_ab/n_b (Agrawal & Srikant's support/
  * confidence frame plus the symmetric scores).
  *
  * 100 TB shape — the pair explosion is generated MAP-SIDE, never by a
  * self-join: items are deduped per basket (one shuffle), each basket's
  * sorted item list emits its k(k-1)/2 ordered pairs with a nested
  * `transform` (row-local, bounded by the basket-size cap), and one
  * counting shuffle keyed by the pair lands the result. A self-join on
  * the basket key would shuffle the item table TWICE and re-materialize
  * every basket k times; this shape pays one groupBy on exactly the
  * same key (AQE reuses the exchange for the basket fold and the item
  * census reads the same deduped table). Skew: a viral basket with B
  * items emits B²/2 pairs in one task — `maxBasketSize` drops such
  * baskets at the dedup stage with a LOGGED dropped-basket count (the
  * house "no silent caps" rule), the way real co-purchase pipelines
  * cap fan-out.
  */
object MarketBasket {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** `maxBasketSize`: baskets with more distinct items are excluded
    * ENTIRELY — from the pair explosion, the item census, and the
    * basket count N — as if they never occurred (a viral basket's item
    * counts would otherwise skew lift for every pair it touches). The
    * dropped-basket count is logged; the default (Int.MaxValue) caps
    * nothing, runs no extra job, and is identity-pinned to the uncapped
    * output in MarketBasketSpec.
    */
  def pairStats(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L,
      maxBasketSize: Int = Int.MaxValue): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    // Persisted and NOT unpersisted here: the returned frame is lazy
    // and reads this cache when the caller executes it (an unpersist on
    // function exit would silently re-run the dedup shuffle three
    // times — plan-audited). LRU eviction reclaims it; callers doing
    // repeated mining can unpersist explicitly.
    val raw: DataFrame =
      df.select(col(basketCol).as("b"), col(itemCol).as("i"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // One sizes aggregate on the persisted dedup table (same key as the
    // basket fold below — AQE reuses the exchange) yields the drop
    // census AND the lift denominator: no separate distinct-basket
    // count job on the capped path.
    val (items: DataFrame, nBaskets: Double) =
      if (maxBasketSize == Int.MaxValue)
        (raw, raw.select("b").distinct().count().toDouble)
      else {
        // NOT persisted: it is read once eagerly (the census head below)
        // and once lazily (the semi-join build when the returned frame
        // executes) — both are one cheap groupBy over the persisted
        // dedup table, and persisting it here accreted a cache per
        // mining call that nothing ever released (r16 advice).
        val sizes = raw.groupBy("b").agg(count(lit(1)).as("__sz"))
        val st = sizes.agg(
          count(lit(1)).as("__total"),
          sum(when(col("__sz") <= maxBasketSize, 1L).otherwise(0L)).as("__kept"))
          .head()
        val (total, kept) = (st.getLong(0), st.getLong(1))
        if (kept < total)
          log.warn(s"market-basket: dropped ${total - kept} viral basket(s) " +
            s"with > $maxBasketSize distinct items from pair mining " +
            s"($kept of $total baskets kept)")
        val pruned =
          if (kept == total) raw
          else raw.join(
              sizes.filter(col("__sz") <= maxBasketSize).select("b"),
              Seq("b"), "left_semi")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (pruned, kept.toDouble)
      }
    val itemCnt = items.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val its = items.groupBy("b").agg(sort_array(collect_set(col("i"))).as("its"))
    // Ordered pairs (a < b by the sort) emitted row-locally.
    val pairs = its.select(explode(flatten(transform(col("its"),
      (x, idx) => transform(
        slice(col("its"), idx + 2, greatest(size(col("its")) - idx - 1, lit(0))),
        y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("item_a"), col("p.b").as("item_b"))
    val pairCnt = pairs.groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val ia = itemCnt.select(col("i").as("item_a"), col("n_i").as("n_a"))
    val ib = itemCnt.select(col("i").as("item_b"), col("n_i").as("n_b"))
    pairCnt.join(ia, "item_a").join(ib, "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double")
          / sqrt(col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("cosine"),
        round(col("n_ab").cast("double") * lit(nBaskets)
          / (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("lift"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_a_b"),
        round(col("n_ab").cast("double") / col("n_b"), 6).as("conf_b_a"))
  }

  /** Top-k "customers also bought" per item from [[pairStats]]:
    * symmetrize the canonical a<b pairs, rank each item's partners by
    * (cosine desc, partner asc — the deterministic tie-break), keep k.
    * A window over the bounded pair table; the mining cost is
    * [[pairStats]]'s.
    */
  def topRecommendations(
      pairs: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    // The symmetrizing union reads `pairs` TWICE; without this persist
    // the whole mining chain (pair explode, count, stat joins) ran
    // once per side (plan-audited, r15b). Bounded: the >=minPairCount
    // pair table. Same no-unpersist rationale as pairStats' items.
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sym = p
      .select(col("item_a").as("item"), col("item_b").as("rec"),
        col("cosine"), col("n_ab"))
      .unionByName(p.select(col("item_b").as("item"),
        col("item_a").as("rec"), col("cosine"), col("n_ab")))
    sym.withColumn("rank", row_number().over(
        Window.partitionBy("item")
          .orderBy(col("cosine").desc, col("rec"))))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("rec"), col("cosine"), col("n_ab"))
  }
}
