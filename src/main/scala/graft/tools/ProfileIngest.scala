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

    // piecewise re-run of batch 1's internals
    val index = time("readIndex")(Ingest.readIndex(spark, idx, 1L))
    val inBatch = Dedup.dropExactDuplicates(odds, "doc_id", "text")
    time("dropExactDuplicates count")(println("  n=" + inBatch.count()))
    val surv = Dedup.dropAgainstIndex(inBatch, "doc_id", "text", index,
      minAgreement = 0.9).persist()
    time("dropAgainstIndex count")(println("  n=" + surv.count()))
    time("pairsAgainstIndex count")(println("  n=" + Dedup.pairsAgainstIndex(
      surv, "doc_id", "text", index, minAgreement = 0.5).count()))
    time("minHashNearDuplicates(surv) count")(println("  n=" + Dedup
      .minHashNearDuplicates(surv, "doc_id", "text", 3, 64, 16, 0.5).count()))
    time("minHashNearDuplicates(odds plain) count")(println("  n=" + Dedup
      .minHashNearDuplicates(odds, "doc_id", "text", 3, 64, 16, 0.5).count()))
    val survMat = surv.select("doc_id", "text")
    survMat.write.mode("overwrite").parquet("target/tmp/prof_surv_mat")
    val survP = spark.read.parquet("target/tmp/prof_surv_mat")
    time("minHashNearDuplicates(surv via parquet) count")(println("  n=" + Dedup
      .minHashNearDuplicates(survP, "doc_id", "text", 3, 64, 16, 0.5).count()))
    val pairs = Dedup.pairsAgainstIndex(surv, "doc_id", "text", index, minAgreement = 0.5)
      .select("id_a", "id_b")
      .unionByName(Dedup.minHashNearDuplicates(surv, "doc_id", "text", 3, 64, 16, 0.5)
        .select("id_a", "id_b"))
    time("applyEdges(batch-1 pairs)")(
      ClusterStore.applyEdges(spark, store, pairs))
    time("membershipFor count")(println("  n=" + ClusterStore
      .membershipFor(spark, store, surv, "doc_id").count()))
    spark.stop()
  }
}
