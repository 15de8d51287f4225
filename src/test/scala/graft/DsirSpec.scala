package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // Two "dialects": target-ish docs reuse a small shared vocabulary,
  // off-target docs draw from a disjoint one.
  private def corpus = Seq(
    (1L, "t", "alpha beta gamma alpha beta"),
    (2L, "t", "beta gamma delta alpha"),
    (3L, "t", "gamma alpha beta beta"),
    (4L, "o", "zeta eta theta iota"),
    (5L, "o", "eta theta iota kappa zeta"),
    (6L, "o", "theta kappa zeta eta"),
    (7L, "o", "")
  ).toDF("doc_id", "grp", "text")

  test("hashedBuckets matches the JVM md5+rot-xor reference; gramless empty; sorted") {
    // The oracle-replayable definition: 60-bit md5 prefix per TOKEN,
    // bigram = rot17_60(h1) XOR h2, all mod buckets, sorted multiset.
    def h60(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def want(text: String, b: Int): Seq[Int] = {
      val ts = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val hs = ts.map(h60)
      val uni = hs.map(h => (h % b).toInt)
      val bi = hs.zip(hs.drop(1)).map { case (a, c) =>
        (((((a & 8796093022207L) << 17) | (a >>> 43)) ^ c) % b).toInt
      }
      (uni ++ bi).sorted
    }
    val texts = Seq("alpha beta gamma", "single", "", "  padded   tokens  ")
    val got = texts.toDF("text")
      .select(Dsir.hashedBuckets($"text", B).as("bs"))
      .as[Seq[Int]].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g == want(t, B), s"mismatch for '$t': $g vs ${want(t, B)}") }
    intercept[IllegalArgumentException] {
      Dsir.hashedBuckets($"text", B, ns = Seq(1, 2, 3))
    }
  }

  test("identical target and raw censuses give exactly zero weights") {
    val c = Dsir.featureCensus(corpus, "text", B)
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", c, c, B)
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    assert(w.size == 7)
    // The smoothed log terms cancel symbolically per bucket, so the
    // fold adds literal zeros — exact, not approximate.
    w.values.foreach(v => assert(v == 0.0))
  }

  test("target-like documents score higher; gramless doc scores 0.0") {
    val target = corpus.filter($"grp" === "t")
    val tc = Dsir.featureCensus(target, "text", B)
    val rc = Dsir.featureCensus(corpus, "text", B)
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", tc, rc, B)
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    val tAvg = Seq(1L, 2L, 3L).map(w).sum / 3
    val oAvg = Seq(4L, 5L, 6L).map(w).sum / 3
    assert(tAvg > 0.0, s"target slice should be upweighted, got $tAvg")
    assert(oAvg < 0.0, s"off-target slice should be downweighted, got $oAvg")
    assert(w(7L) == 0.0)
  }

  test("inline literal-array path == explode/broadcast-join path, bit-identical") {
    val target = corpus.filter($"grp" === "t")
    val tc = Dsir.featureCensus(target, "text", B)
    val rc = Dsir.featureCensus(corpus, "text", B)
    def weights(inline: Boolean) =
      Dsir.importanceWeights(corpus, "doc_id", "text", tc, rc, B,
          inlineRatios = Some(inline))
        .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    val a = weights(true)
    val b = weights(false)
    assert(a == b, "both folds run in ascending bucket order and must agree exactly")
  }

  test("resampleTopK matches the naive log-key sort, is deterministic, and skews to target") {
    val target = corpus.filter($"grp" === "t")
    val tc = Dsir.featureCensus(target, "text", B)
    val rc = Dsir.featureCensus(corpus, "text", B)
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", tc, rc, B)

    val got = Dsir.resampleTopK(w, "doc_id", col("log_weight"), 3L, salt = "s1",
        tailThreshold = 2)
      .select("doc_id").as[Long].collect().toSet
    // Naive replay: full sort by the same key, take 3.
    val h52 = conv(substring(md5(concat($"doc_id".cast("string"), lit("s1"))), 1, 13),
      16, 10).cast("long")
    val u = (h52 + 1).cast("double") / 4503599627370496.0
    val naive = w.withColumn("__k", log(-log(u)) - col("log_weight"))
      .orderBy($"__k", $"doc_id").limit(3)
      .select("doc_id").as[Long].collect().toSet
    assert(got == naive)
    val again = Dsir.resampleTopK(w, "doc_id", col("log_weight"), 3L, salt = "s1",
        tailThreshold = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got, "deterministic in (id, salt)")

    // Strong upweighting pulls the sample toward the target dialect:
    // with weights exp(logw) spanning several nats, target docs should
    // dominate a k=3 draw on most salts; check a clear majority across
    // a few salts rather than any single draw.
    val majorities = Seq("a", "b", "c", "d", "e").map { s =>
      val ids = Dsir.resampleTopK(w, "doc_id", col("log_weight"), 3L, salt = s,
          tailThreshold = 2)
        .select("doc_id").as[Long].collect()
      ids.count(_ <= 3L)
    }
    assert(majorities.sum > 5 * 3 / 2,
      s"target docs should win most slots across salts, got $majorities")
  }

  test("featureCensusPair == separate featureCensus calls, exactly") {
    val sep = (
      Dsir.featureCensus(corpus.filter($"grp" === "t"), "text", B),
      Dsir.featureCensus(corpus, "text", B))
    val pair = Dsir.featureCensusPair(corpus, "text", B, $"grp" === "t")
    def m(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.select($"bucket".cast("int"), $"cnt".cast("long"))
        .as[(Int, Long)].collect().toMap
    assert(m(pair._1) == m(sep._1), "target census counts must match")
    assert(m(pair._2) == m(sep._2), "raw census counts must match")
  }

  test("sampled raw census preserves the weight ranking structure") {
    // 440 docs in 11 classes: class c mixes c target words with
    // (10 - c) off-target words, so true importance is monotone in c.
    // A 30% sampled raw census (counts scaled by 1/rate) must preserve
    // that class-level monotonicity — the rank structure scoring
    // actually consumes — while reading a fraction of the corpus.
    val tWords = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val oWords = Seq("zeta", "eta", "theta", "iota", "kappa")
    val docs = (0 until 440).map { i =>
      val c = i % 11
      val words = (0 until c).map(j => tWords(j % 5)) ++
        (0 until (10 - c)).map(j => oWords((i + j) % 5))
      (i.toLong, c, words.mkString(" "))
    }.toDF("doc_id", "cls", "text")
    val target = docs.filter($"cls" >= 8)
    val tc = Dsir.featureCensus(target, "text", B)
    def classMeans(rc: org.apache.spark.sql.DataFrame): Seq[Double] =
      Dsir.importanceWeights(docs, "doc_id", "text", tc, rc, B)
        .groupBy("cls").agg(avg("log_weight").as("w"))
        .orderBy("cls").select("w").as[Double].collect().toSeq
    val full = classMeans(Dsir.featureCensus(docs, "text", B))
    val sampled = classMeans(
      Dsir.featureCensusSampled(docs, "doc_id", "text", B, rate = 0.3))
    assert(full.sliding(2).forall(p => p(0) < p(1)),
      s"full-census class means must ascend, got $full")
    assert(sampled.sliding(2).forall(p => p(0) < p(1)),
      s"sampled-census class means must ascend, got $sampled")
    // Scaled counts estimate the full census totals.
    val fullTot = Dsir.featureCensus(docs, "text", B)
      .agg(sum("cnt")).head().getLong(0).toDouble
    val sampTot = Dsir.featureCensusSampled(docs, "doc_id", "text", B, rate = 0.3)
      .agg(sum("cnt")).head().getLong(0).toDouble
    assert(math.abs(sampTot - fullTot) / fullTot < 0.3,
      s"scaled sample total $sampTot should approximate full total $fullTot")
  }

  test("streaming census sink == one-shot pair builder, exactly") {
    val root = s"target/tmp/dsir_census_stream_${System.nanoTime()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    corpus.coalesce(1).write.mode("overwrite").parquet(s"$root/stage")
    val f = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/stage"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(f, java.nio.file.Paths.get(s"$root/in/b0.parquet"))
    val stream = spark.readStream.schema(corpus.schema).parquet(s"$root/in")
    val q = Dsir.censusSink(stream, "text", B, col("grp") === "t",
      s"$root/census", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    def m(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.select($"bucket".cast("int"), $"cnt".cast("long"))
        .as[(Int, Long)].collect().toMap
    val (tc, rc) = Dsir.featureCensusPair(corpus, "text", B, $"grp" === "t")
    assert(m(Dsir.readFeatureCensus(spark, s"$root/census/target")) == m(tc))
    assert(m(Dsir.readFeatureCensus(spark, s"$root/census/raw")) == m(rc))
  }

  test("k >= eligible returns every scored row; k = 0 returns none") {
    val c = Dsir.featureCensus(corpus, "text", B)
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", c, c, B)
    assert(Dsir.resampleTopK(w, "doc_id", col("log_weight"), 100L).count() == 7)
    assert(Dsir.resampleTopK(w, "doc_id", col("log_weight"), 0L).count() == 0)
  }
}
