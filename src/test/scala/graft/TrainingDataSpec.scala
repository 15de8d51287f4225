package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingData

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("packShards: offset packing by cumulative token budget, per group, id order") {
    // tokens: g1 -> 3, 4, 5, 2 (cum 3, 7, 12, 14); g2 -> 6 (cum 6)
    val docs = Seq(
      (1L, "g1", "one two three"),
      (2L, "g1", "a b c d"),
      (3L, "g1", "v w x y z"),
      (4L, "g1", "p q"),
      (5L, "g2", "u1 u2 u3 u4 u5 u6")
    ).toDF("doc_id", "source", "text")
    val packed = TrainingData.packShards(
        docs, "doc_id", "source",
        graft.functions.TextFunctions.tokenCount(col("text")), budgetTokens = 5L)
      .select("doc_id", "n_tokens", "shard_idx")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // start offsets: doc1 0 -> shard 0; doc2 3 -> shard 0; doc3 7 -> shard 1;
    // doc4 12 -> shard 2; g2 doc5 0 -> shard 0 (groups pack independently).
    assert(packed(1L) == (3, 0))
    assert(packed(2L) == (4, 0))
    assert(packed(3L) == (5, 1))
    assert(packed(4L) == (2, 2))
    assert(packed(5L) == (6, 0))
  }

  test("shardManifest summarizes each shard; writeShards lays out one dir per shard") {
    val docs = Seq(
      (1L, "g1", "one two three"),
      (2L, "g1", "a b c d"),
      (3L, "g1", "v w x y z"),
      (4L, "g1", "p q"),
      (5L, "g2", "u1 u2 u3 u4 u5 u6")
    ).toDF("doc_id", "source", "text")
    val packed = TrainingData.packShards(
      docs, "doc_id", "source",
      graft.functions.TextFunctions.tokenCount(col("text")), budgetTokens = 5L)
    val manifest = TrainingData.shardManifest(packed, "source", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(manifest(("g1", 0)) == (2L, 7L, 1L, 2L))
    assert(manifest(("g1", 1)) == (1L, 5L, 3L, 3L))
    assert(manifest(("g1", 2)) == (1L, 2L, 4L, 4L))
    assert(manifest(("g2", 0)) == (1L, 6L, 5L, 5L))

    val out = s"target/tmp/shards_${System.nanoTime()}"
    TrainingData.writeShards(packed, "source", "doc_id", out)
    // One data directory per manifest row, with matching row counts.
    manifest.foreach { case ((src, idx), (nDocs, _, _, _)) =>
      val part = spark.read.parquet(s"$out/data/source=$src/shard_idx=$idx")
      assert(part.count() == nDocs, s"shard $src/$idx row count")
    }
    val persisted = spark.read.parquet(s"$out/_manifest")
    assert(persisted.count() == manifest.size)
  }

  test("packShards rejects a non-positive budget") {
    val docs = Seq((1L, "g", "x")).toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      TrainingData.packShards(docs, "doc_id", "source", lit(1), 0L)
    }
  }

  test("deterministicSplit: stable membership, roughly proportional, salt-independent resplit") {
    val ids = (0L until 500L).map(Tuple1(_)).toDF("doc_id")
    val split = TrainingData.deterministicSplit(
        ids, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 350 && counts("train") < 450, s"train share off: $counts")
    assert(counts.getOrElse("val", 0) > 20 && counts.getOrElse("test", 0) > 20, s"tail splits off: $counts")

    // Membership is a pure function of the id: subset recomputation agrees.
    val subset = TrainingData.deterministicSplit(
        ids.filter($"doc_id" < 100), "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset.forall { case (k, v) => split(k) == v })

    // A salt derives a different (still deterministic) split.
    val salted = TrainingData.deterministicSplit(
        ids, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "v2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(salted != split)

    intercept[IllegalArgumentException] {
      TrainingData.deterministicSplit(ids, "doc_id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("benchmarkContamination counts shared distinct grams against the eval set") {
    val eval = Seq((100L, "a b c d e")).toDF("doc_id", "text") // grams: abc, bcd, cde
    val corpus = Seq(
      (1L, "a b c d e"),        // identical: 3/3 shared
      (2L, "z a b c q"),        // grams: zab, abc, bcq -> 1/3 shared
      (3L, "x y z w v"),        // disjoint: 0/3
      (4L, "a b")               // < n tokens: no grams
    ).toDF("doc_id", "text")
    val got = TrainingData.benchmarkContamination(
        corpus, "doc_id", "text", eval, "text", n = 3, flagThreshold = 0.5)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got(1L) == (3, 3L, 1.0, true))
    assert(got(2L)._1 == 3 && got(2L)._2 == 1L && !got(2L)._4)
    assert(math.abs(got(2L)._3 - 1.0 / 3.0) < 1e-9)
    assert(got(3L) == (3, 0L, 0.0, false))
    assert(got(4L) == (0, 0L, 0.0, false))
  }
}
