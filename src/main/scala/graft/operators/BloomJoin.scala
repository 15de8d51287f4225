package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.HashExpressions

/** Bloom-prefiltered equi-join — the big-big join shuffle reducer.
  * When the build side is too large to broadcast EXACTLY but its key
  * set fits a bloom filter (~1.2 MB per million keys at 1% fpp), the
  * probe side is filtered ROW-LOCALLY against the bloom BEFORE its
  * exchange: rows whose key cannot match never enter the shuffle. On
  * a selective join (the common fact-against-filtered-dim shape at
  * 100 TB) this removes most of the probe side's shuffle volume —
  * the same idea as Spark's own runtime row-level bloom pushdown
  * (spark.sql.optimizer.runtime.bloomFilter), made explicit,
  * deterministic, and tunable.
  *
  * EXACTNESS: bloom false positives pass the prefilter but are then
  * dropped by the real join, so for join types that do not keep
  * unmatched probe rows (inner, left_semi) the result is EXACT —
  * hash-matched by `q_join_bloom`'s oracle. Outer joins are refused:
  * a prefilter that drops unmatched probe rows would change their
  * result.
  *
  * Keys of any type/arity join through `xxhash64` on BOTH sides, so
  * the bloom stores longs and the probe test is one codegen'd
  * `mightContainLong` per row (BloomMightContainExpr). A hash
  * collision between a probe key and a build key is just one more
  * false positive — swallowed by the exact join.
  */
object BloomJoin {

  def bloomFilteredJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      joinType: String = "inner",
      expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    require(Set("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"bloom prefilter is only exact for inner/left_semi joins, got $joinType")
    val bf = build
      .select(xxhash64(keys.map(col): _*).as("__k"))
      .stat.bloomFilter("__k", expectedKeys, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray.toSeq
    }
    val pre = probe.filter(
      HashExpressions.bloomMightContain(xxhash64(keys.map(col): _*), bytes))
    pre.join(build, keys, joinType)
  }
}
