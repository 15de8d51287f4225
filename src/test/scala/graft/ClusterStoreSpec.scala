package graft

import org.apache.spark.sql.functions._

import graft.operators.{ClusterStore, Components, Dedup, TrainingData}
import graft.sources.TableIO

/** Persisted incremental cluster membership: restriction law
  * (batched applyEdges == one full CC), cluster-linking relabels, and
  * the store-backed leakage-safe split against the full recompute.
  */
class ClusterStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) = s"target/tmp/${name}_${System.nanoTime()}"

  private def membership(path: String): Map[Long, Long] =
    ClusterStore.read(spark, path).as[(Long, Long)].collect().toMap

  test("applyEdges folds batches to the same membership as one full CC") {
    val corpus = TableIO.table(spark, Sf0001, "documents")
    val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, minJaccard = 0.2)
      .persist()
    assert(pairs.count() > 0, "fixture must produce near-dup pairs")
    val path = tmp("cluster_store")
    // three deterministic batches partitioned by pair key
    for (r <- 0 to 2)
      ClusterStore.applyEdges(
        spark, path, pairs.filter((col("id_a") + col("id_b")) % 3 === r))
    val full = Components.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(membership(path) == full)
    pairs.unpersist()

    // applying an already-applied batch again is a no-op on membership
    ClusterStore.applyEdges(
      spark, path, pairs.filter((col("id_a") + col("id_b")) % 3 === 1))
    assert(membership(path) == full)
  }

  test("a linking edge relabels BOTH standing clusters, wholesale") {
    val path = tmp("cluster_link")
    ClusterStore.applyEdges(spark, path, Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"))
    assert(membership(path) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    // the linking batch: 2~3 merges {1,2} and {3,4} under min id 1
    ClusterStore.applyEdges(spark, path, Seq((2L, 3L)).toDF("id_a", "id_b"))
    assert(membership(path) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // a later batch touching one member cannot split the cluster
    ClusterStore.applyEdges(spark, path, Seq((4L, 9L)).toDF("id_a", "id_b"))
    assert(membership(path) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 1L))
  }

  test("membershipFor labels singletons with their own id; empty store reads empty") {
    val path = tmp("cluster_empty")
    assert(membership(path).isEmpty)
    ClusterStore.applyEdges(spark, path, Seq((10L, 12L)).toDF("id_a", "id_b"))
    val docs = Seq((10L, "x"), (11L, "y"), (12L, "z")).toDF("doc_id", "text")
    val got = ClusterStore.membershipFor(spark, path, docs, "doc_id")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 11L, 12L -> 10L))
  }

  test("clusterSink: streamed pair batches == one full CC over all pairs") {
    val root = tmp("cluster_stream")
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val batches = Seq(
      Seq((1L, 2L), (3L, 4L)),
      Seq((5L, 6L)),
      Seq((2L, 3L))) // links {1,2} and {3,4} mid-stream
    def feed(i: Int): Unit = {
      val stage = s"$root/stage$i"
      batches(i).toDF("id_a", "id_b").coalesce(1).write.parquet(stage)
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(f, java.nio.file.Paths.get(s"$in/b$i.parquet"))
    }
    feed(0)
    val stream = spark.readStream
      .schema(batches(0).toDF("id_a", "id_b").schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = ClusterStore.clusterSink(stream, s"$root/store", s"$root/ckpt")
    try {
      q.processAllAvailable()
      feed(1); q.processAllAvailable()
      feed(2); q.processAllAvailable()
    } finally q.stop()
    assert(membership(s"$root/store") ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("two-batch ingestion: in-batch + against-index pairs keep splits leakage-safe ACROSS batches") {
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest until the evening light fades away"
    val b1 = Seq(
      (1L, base + " version one tail"),
      (2L, base + " version two tail"),   // near-dup of 1
      (3L, "completely unrelated text about database engines and storage formats full of different words")
    ).toDF("doc_id", "text")
    val b2 = Seq(
      (11L, base + " version one tail"),  // EXACT copy of 1 — arrives a batch later
      (12L, base + " version two tail x"),// near-dup of 2
      (13L, "another entirely distinct document mentioning compilers parsers and tokenizers only")
    ).toDF("doc_id", "text")
    val path = tmp("cluster_ingest")
    // batch 1: in-batch pairs fold; fingerprints persist
    ClusterStore.applyEdges(spark, path,
      Dedup.minHashNearDuplicates(b1, "doc_id", "text", n = 3, numHashes = 64,
        bands = 16, minJaccard = 0.5))
    val index = Dedup.fingerprintIndex(b1, "doc_id", "text")
    // batch 2: in-batch pairs PLUS cross-batch pairs against the index
    val cross = Dedup.pairsAgainstIndex(b2, "doc_id", "text", index)
    val crossMap = cross.select("id_a", "id_b", "agreement")
      .as[(Long, Long, Double)].collect()
    assert(crossMap.exists(p => p._1 == 11L && p._2 == 1L && p._3 == 1.0),
      s"exact copy must pair at 1.0: ${crossMap.toSeq}")
    assert(crossMap.exists(p => p._1 == 12L && p._2 == 2L && p._3 >= 0.5),
      s"near copy must pair: ${crossMap.toSeq}")
    assert(!crossMap.exists(p => p._1 == 13L), "clean doc must not pair")
    ClusterStore.applyEdges(spark, path,
      Dedup.minHashNearDuplicates(b2, "doc_id", "text", n = 3, numHashes = 64,
        bands = 16, minJaccard = 0.5)
        .select("id_a", "id_b")
        .unionByName(cross.select("id_a", "id_b")))
    // 1,2,11,12 share one cluster (min id 1); 3 and 13 stay singletons
    val m = membership(path)
    assert(Set(1L, 2L, 11L, 12L).forall(id => m.get(id).contains(1L)), s"membership $m")
    assert(!m.contains(3L) && !m.contains(13L))
    // and the standing split can never separate the cross-batch copies
    val all = b1.unionByName(b2)
    val split = TrainingData.leakageSafeSplitIncremental(
        all, "doc_id", path, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(Set(split(1L), split(2L), split(11L), split(12L)).size == 1,
      s"cross-batch duplicates must share one split: $split")
  }

  test("incremental leakage-safe split == full recompute (no pair straddles splits)") {
    val corpus = TableIO.table(spark, Sf0001, "documents")
    val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, minJaccard = 0.2)
      .persist()
    val path = tmp("cluster_split")
    for (r <- 0 to 1)
      ClusterStore.applyEdges(
        spark, path, pairs.filter(col("id_a") % 2 === r))
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val incr = TrainingData.leakageSafeSplitIncremental(corpus, "doc_id", path, w)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect().toSet
    val full = TrainingData.leakageSafeSplit(corpus, "doc_id", pairs, w)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect().toSet
    assert(incr == full)
    // leakage safety: both docs of every pair share a split
    val splitOf = incr.map(r => r._1 -> r._3).toMap
    pairs.select("id_a", "id_b").as[(Long, Long)].collect()
      .foreach { case (a, b) => assert(splitOf(a) == splitOf(b), s"pair ($a,$b)") }
    pairs.unpersist()
  }
}
