package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting is an algebraic rewrite: salted results must equal unsalted
  * results exactly, for any salt count, including skewed inputs.
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  private def skewed = {
    // key 1 holds 90% of rows — the straggler shape.
    val rows = (1 to 900).map(i => (1L, i.toLong, i * 0.5)) ++
      (1 to 100).map(i => ((i % 10 + 2).toLong, i.toLong, i * 2.0))
    rows.toDF("k", "row_id", "v")
  }

  test("saltedAgg equals plain groupBy for counts and sums") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .orderBy("k").collect()
    val salted = Skew.saltedAgg(
      skewed, "k", col("row_id"), numSalts = 8,
      counts = Seq("n" -> "*"), sums = Seq("total" -> col("v")))
      .orderBy("k").collect()
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("skewedEquiJoin equals plain inner join on skewed keys") {
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (11L, "c")).toDF("dk", "name")
    val plain = skewed.join(dim, col("k") === col("dk"))
      .select("k", "row_id", "name").orderBy("k", "row_id").collect()
    val heavy = Skew.heavyHitters(skewed, "k", topK = 1)
    assert(heavy == Seq(1L))
    val salted = Skew.skewedEquiJoin(skewed, dim, "k", "dk", heavy, 8, col("row_id"))
      .select("k", "row_id", "name").orderBy("k", "row_id").collect()
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("skewedEquiJoin spreads a hot key over multiple shuffle partitions") {
    val dim = Seq((1L, "hot")).toDF("dk", "name")
    val salted = skewed.withColumn(
      "__salt", when(col("k").isin(1L), pmod(hash(col("row_id")), lit(8))).otherwise(lit(0)))
    val nSalts = salted.filter(col("k") === 1L).select("__salt").distinct().count()
    assert(nSalts > 1, "hot key should fan out over >1 salt value")
  }

  test("CMS counters accumulate over a stream with depth x width bounded state") {
    // groupBy(i, bucket).count() is a standard streaming aggregation
    // whose state is <= depth x width rows REGARDLESS of key cardinality
    // — the sketch property that makes frequency tracking viable on an
    // unbounded stream. Golden: streamed counters == batch counters.
    val root = s"target/tmp/cms_stream_${System.nanoTime()}"
    Seq.fill(50)(1L).concat(10L until 30L).toDF("k").coalesce(1)
      .write.parquet(s"$root/in")
    val schema = spark.read.parquet(s"$root/in").schema
    val depth = 4; val width = 64
    val q = Skew.cmsCounters(spark.readStream.schema(schema).parquet(s"$root/in"), "k", depth, width)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete).start()
    try {
      // second batch arrives after the stream starts
      Seq.fill(25)(1L).concat(30L until 40L).toDF("k").coalesce(1)
        .write.mode("append").parquet(s"$root/in")
      q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .orderBy("i", "bucket").collect().map(_.toSeq).toSeq
      val batch = Skew.cmsCounters(spark.read.parquet(s"$root/in"), "k", depth, width)
        .orderBy("i", "bucket").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.size <= depth * width)
    } finally q.stop()
  }

  test("CMS estimates are one-sided and exact for dominant keys at low load") {
    // 3 heavy keys + light tail; sketch load factor is tiny, so heavy
    // estimates should be exact and every estimate >= the true count
    val rows = Seq.fill(500)(1L) ++ Seq.fill(300)(2L) ++ Seq.fill(200)(3L) ++
      (100L until 150L)
    val df = rows.toDF("k")
    val depth = 4; val width = 512
    val counters = Skew.cmsCounters(df, "k", depth, width)
    // counter table is bounded by depth x width no matter the cardinality
    assert(counters.count() <= depth.toLong * width)
    // total per hash row equals the row count (every row lands once per row i)
    val perRow = counters.groupBy("i").agg(sum("count").as("s"))
      .select("s").as[Long].collect().toSet
    assert(perRow == Set(rows.size.toLong))
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val keys = truth.keys.toSeq.toDF("k")
    val est = Skew.cmsEstimate(counters, keys, "k", depth, width)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS estimate below truth for $k")
      assert(est(k) <= n + rows.size / width + 5, s"estimate too loose for $k")
    }
    assert(est(1L) == 500L && est(2L) == 300L)
  }
}
