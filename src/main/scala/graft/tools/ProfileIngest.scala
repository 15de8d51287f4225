package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.{ClusterStore, Dedup, Ingest}
import graft.sources.TableIO

/** Dev tool: stage-level timing of the ingestIncrement pipeline at a
  * given SF — finds which stage pays when the composed contract query
  * runs hot.
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = TableIO.table(spark, sfDir, "documents")
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val base = s"target/tmp/prof_ingest_${System.nanoTime()}"
    val (idx, store, out) = (s"$base/idx", s"$base/store", s"$base/out")

    time("ingest batch 0 (evens)")(
      Ingest.ingestIncrement(evens, "doc_id", "text", idx, store, out, 0L))
    time("ingest batch 1 (odds)")(
      Ingest.ingestIncrement(odds, "doc_id", "text", idx, store, out, 1L))

    // piecewise re-run of batch 1's internals (the r16 single-sketch
    // stages, in the order ingestIncrement runs them)
    val index = time("readIndex")(Ingest.readIndex(spark, idx, 1L))
    val inBatch = Dedup.dropExactDuplicates(odds, "doc_id", "text")
    time("dropExactDuplicates count")(println("  n=" + inBatch.count()))
    val fpBatch = Dedup.fingerprintIndex(inBatch, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("fingerprint sketch count")(println("  n=" + fpBatch.count()))
    val dupIds = Dedup.duplicateIdsAgainstIndex(fpBatch, index, minAgreement = 0.9)
    time("duplicateIdsAgainstIndex count")(println("  n=" + dupIds.count()))
    time("survivor landing write")(
      inBatch.join(dupIds.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$out/batch=9"))
    val surv = spark.read.parquet(s"$out/batch=9")
    time("batch count (dropped stat)")(println("  n=" + odds.count()))
    time("survivors count")(println("  n=" + surv.count()))
    time("delta write")(
      fpBatch.join(surv.select(col("doc_id").as("id")), Seq("id"), "left_semi")
        .write.mode("overwrite").parquet(s"$idx/delta=9"))
    val fpSurv = spark.read.parquet(s"$idx/delta=9").select("id", "content_md5", "sig")
    time("pairsAgainstIndexPresketched count")(println("  n=" +
      Dedup.pairsAgainstIndexPresketched(fpSurv, index, minAgreement = 0.5).count()))
    time("minHashNearDuplicatesPresketched count")(println("  n=" +
      Dedup.minHashNearDuplicatesPresketched(
        surv, fpSurv, "doc_id", "text", 3, 64, 16, 0.5).count()))
    val pairs = Dedup.pairsAgainstIndexPresketched(fpSurv, index, minAgreement = 0.5)
      .select("id_a", "id_b")
      .unionByName(Dedup.minHashNearDuplicatesPresketched(
          surv, fpSurv, "doc_id", "text", 3, 64, 16, 0.5)
        .select("id_a", "id_b"))
    time("applyEdges(batch-1 pairs)")(
      ClusterStore.applyEdges(spark, store, pairs))
    time("membershipFor count")(println("  n=" + ClusterStore
      .membershipFor(spark, store, surv, "doc_id").count()))

    // backfill A/B (r16): thirds of the corpus, sequential folds vs the
    // single batched fold — the N-1 amortized CC rounds.
    val thirds = (0L to 2L).map(i =>
      i -> docs.filter(col("doc_id") % 3 === i))
    val baseS = s"target/tmp/prof_bk_s_${System.nanoTime()}"
    time("3-batch sequential ingest")(
      thirds.foreach { case (i, b) =>
        Ingest.ingestIncrement(b, "doc_id", "text",
          s"$baseS/idx", s"$baseS/st", s"$baseS/out", batchId = i)
      })
    val baseB = s"target/tmp/prof_bk_b_${System.nanoTime()}"
    time("3-batch backfill (one fold)")(
      Ingest.ingestBackfill(thirds, "doc_id", "text",
        s"$baseB/idx", s"$baseB/st", s"$baseB/out"))
    spark.stop()
  }
}
