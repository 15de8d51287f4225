package graft

import org.apache.spark.sql.functions._

import graft.operators.{SampleStore, TrainingData}
import graft.sources.TableIO

/** Standing exactly-k sample: fold == one-shot under arbitrary batch
  * splits, replay idempotence (with and without the watermark),
  * k-exceeds-corpus, and the streamed sink == batch-fold identity.
  */
class SampleStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id").as[Long].collect().toSet

  test("fold across any batch split equals the one-shot race") {
    val docs = TableIO.table(spark, Sf0001, "documents")
    val oneShot = ids(TrainingData.exactSample(docs, "doc_id", 40L, salt = "ss"))
    for ((parts, tag) <- Seq(2 -> "halves", 5 -> "fifths")) {
      val root = s"target/tmp/sample_store_${tag}_${System.nanoTime()}"
      (0 until parts).foreach { b =>
        SampleStore.fold(
          docs.filter(pmod(col("doc_id"), lit(parts.toLong)) === b.toLong),
          "doc_id", 40L, root, b.toLong, salt = "ss")
      }
      val folded = SampleStore.read(spark, root)
      assert(folded.count() == 40L)
      assert(ids(folded) == oneShot, s"$tag split must reproduce the one-shot sample")
    }
  }

  test("replays: watermark skips at-or-below; without it the re-fold is a no-op") {
    val docs = TableIO.table(spark, Sf0001, "documents")
    val root = s"target/tmp/sample_store_replay_${System.nanoTime()}"
    val b0 = docs.filter(pmod($"doc_id", lit(2L)) === 0)
    val b1 = docs.filter(pmod($"doc_id", lit(2L)) === 1)
    SampleStore.fold(b0, "doc_id", 40L, root, 0L, salt = "ss")
    SampleStore.fold(b1, "doc_id", 40L, root, 1L, salt = "ss")
    val after = ids(SampleStore.read(spark, root))
    // Watermarked replay: skipped outright.
    SampleStore.fold(b0, "doc_id", 40L, root, 0L, salt = "ss")
    assert(ids(SampleStore.read(spark, root)) == after)
    // Same rows under a NEW batch id (a source that re-delivers):
    // idempotent by the id-dedup — the race result cannot change.
    SampleStore.fold(b0, "doc_id", 40L, root, 2L, salt = "ss")
    assert(ids(SampleStore.read(spark, root)) == after)
  }

  test("stratified fold across any batch split equals the one-shot per-group race") {
    val docs = TableIO.table(spark, Sf0001, "documents")
    val oneShot = ids(TrainingData.exactSamplePerGroup(
      docs, "doc_id", "source", k = 5, salt = "gs"))
    val root = s"target/tmp/sample_store_strat_${System.nanoTime()}"
    (0 until 3).foreach { b =>
      SampleStore.foldPerGroup(
        docs.filter(pmod($"doc_id", lit(3L)) === b.toLong),
        "doc_id", "source", k = 5, root, b.toLong, salt = "gs")
    }
    val folded = SampleStore.read(spark, root)
    assert(ids(folded) == oneShot)
    // every group capped at k
    val over = folded.groupBy("source").count().filter($"count" > 5).count()
    assert(over == 0L)
  }

  test("k >= corpus keeps everything seen so far") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val root = s"target/tmp/sample_store_small_${System.nanoTime()}"
    SampleStore.fold(docs.filter($"doc_id" <= 2), "doc_id", 100L, root, 0L)
    SampleStore.fold(docs.filter($"doc_id" === 3), "doc_id", 100L, root, 1L)
    assert(ids(SampleStore.read(spark, root)) == Set(1L, 2L, 3L))
  }

  test("streaming sink: micro-batch folds equal the batch-side fold") {
    val docs = TableIO.table(spark, Sf0001, "documents")
      .select("doc_id", "text")
    val root = s"target/tmp/sample_store_stream_${System.nanoTime()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    docs.coalesce(1).write.mode("overwrite").parquet(s"$root/stage")
    val f = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/stage"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(f, java.nio.file.Paths.get(s"$root/in/b0.parquet"))
    val stream = spark.readStream.schema(docs.schema).parquet(s"$root/in")
    val q = SampleStore.sink(stream, "doc_id", 40L, s"$root/state",
      s"$root/ckpt", salt = "ss")
    try q.processAllAvailable() finally q.stop()
    val streamed = ids(SampleStore.read(spark, s"$root/state"))
    val oneShot = ids(TrainingData.exactSample(docs, "doc_id", 40L, salt = "ss"))
    assert(streamed == oneShot)
  }
}
