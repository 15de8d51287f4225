package graft

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probe = (1L to 20000L).map(i => (i, s"p$i")).toDF("k", "pv")
  private def build = (1L to 20000L).filter(_ % 97 == 0).map(i => (i, s"b$i")).toDF("k", "bv")

  test("bloom-prefiltered inner and left_semi joins equal the plain joins exactly") {
    val plainInner = probe.join(build, Seq("k"), "inner")
      .collect().map(_.toSeq).toSet
    val bloomInner = BloomJoin.bloomFilteredJoin(probe, build, Seq("k"), "inner",
        expectedKeys = 1000)
      .collect().map(_.toSeq).toSet
    assert(bloomInner == plainInner)
    val plainSemi = probe.join(build, Seq("k"), "left_semi")
      .collect().map(_.toSeq).toSet
    val bloomSemi = BloomJoin.bloomFilteredJoin(probe, build, Seq("k"), "left_semi",
        expectedKeys = 1000)
      .collect().map(_.toSeq).toSet
    assert(bloomSemi == plainSemi)
  }

  test("multi-column keys and string keys join through the same hash on both sides") {
    val p = Seq((1L, "a", 1.0), (1L, "b", 2.0), (2L, "a", 3.0)).toDF("k1", "k2", "v")
    val b = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k1", "k2", "w")
    val got = BloomJoin.bloomFilteredJoin(p, b, Seq("k1", "k2"), expectedKeys = 10)
      .select("v").as[Double].collect().toSet
    assert(got == Set(1.0))
  }

  test("outer join types are refused — the prefilter would drop unmatched probe rows") {
    intercept[IllegalArgumentException] {
      BloomJoin.bloomFilteredJoin(probe, build, Seq("k"), "left_outer")
    }
  }

  test("the prefilter is selective and row-local (most non-matching rows never shuffle)") {
    val bf = build.select(xxhash64(col("k")).as("__k"))
      .stat.bloomFilter("__k", 1000, 0.01)
    val bytes = { val o = new java.io.ByteArrayOutputStream(); bf.writeTo(o); o.toByteArray.toSeq }
    val kept = probe.filter(
      graft.plans.HashExpressions.bloomMightContain(xxhash64(col("k")), bytes)).count()
    val matches = 20000 / 97
    // 1% fpp on ~20k rows: expect ~matches + ~200 false positives.
    assert(kept >= matches && kept < matches + 1000, s"kept=$kept")
  }

  test("the bloom filter sits BELOW the probe-side shuffle exchange in the plan") {
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      // File-backed inputs: over a LocalRelation the optimizer
      // (ConvertToLocalRelation) evaluates the prefilter at plan time
      // and nothing would be left to assert on.
      val dir = "target/tmp/bloomjoin_plan"
      probe.write.mode("overwrite").parquet(s"$dir/probe")
      build.write.mode("overwrite").parquet(s"$dir/build")
      val pq = spark.read.parquet(s"$dir/probe")
      val bq = spark.read.parquet(s"$dir/build")
      val plan = BloomJoin.bloomFilteredJoin(pq, bq, Seq("k"), expectedKeys = 1000)
        .queryExecution.executedPlan
      val exchangesWithBloomBelow = plan.collect {
        case e: ShuffleExchangeLike if e.toString.toLowerCase.contains("bloommightcontain") => e
      }
      assert(exchangesWithBloomBelow.nonEmpty,
        s"expected a shuffle exchange with the bloom prefilter beneath it:\n$plan")
      val filters = plan.collect {
        case f: FilterExec if f.condition.toString.toLowerCase.contains("bloommightcontain") => f
      }
      assert(filters.nonEmpty, s"bloom filter not in the physical plan:\n$plan")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
