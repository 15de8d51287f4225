package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.{Dsir, Selection}
import graft.sources.TableIO

/** Dev tool: stage-level timing of the q_dsir_sample lineage — census
  * builds, the scoring pass, the narrow-key cache materialization, the
  * Selection descent, and the winner-recovery join — to attribute the
  * bench time to passes (each full-corpus stage re-hashes every
  * uni+bigram, so pass count IS the cost model).
  */
object ProfileDsir {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dsir] $label%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = TableIO.table(spark, sfDir, "documents")
    println(s"[dsir] docs = ${docs.count()}")
    for (round <- 1 to 2) {
      println(s"[dsir] --- round $round ---")
      val tc = time("target census (en slice)")(
        Dsir.featureCensus(docs.filter(col("lang") === "en"), "text", 1024)
          .localCheckpoint(true))
      val rc = time("raw census (full corpus)")(
        Dsir.featureCensus(docs, "text", 1024).localCheckpoint(true))
      time("fused census pair")(
        Dsir.featureCensusPair(docs, "text", 1024, col("lang") === "en"))
      time("hash only: sum(size(buckets))")(
        docs.select(sum(size(Dsir.hashedBuckets(col("text"), 1024)))).head())
      val w = Dsir.importanceWeights(docs, "doc_id", "text", tc, rc, 1024)
      time("scoring pass (w.count)")(w.count())
      time("scoring forced: sum(log_weight)")(
        w.agg(sum("log_weight")).head())
      val h52 = conv(
        substring(md5(concat(col("doc_id").cast("string"), lit("dsir"))), 1, 13),
        16, 10).cast("long")
      val u = (h52 + 1).cast("double") / 4503599627370496.0
      val keyed = w.filter(col("log_weight").isNotNull)
        .select(col("doc_id").as("__rsk_id"),
          (log(-log(u)) - col("log_weight")).as("__lkey"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("keyed cache materialize (count)")(keyed.count())
      val cutoff = time("Selection descent (tail=64)")(
        Selection.kthSmallest(keyed, "__lkey", 120L, tailThreshold = 64))
      val below = keyed.filter(col("__lkey") < cutoff)
      val b = time("below.count")(below.count())
      val boundary = keyed.filter(col("__lkey") === cutoff)
        .orderBy(col("__rsk_id")).limit((120L - b).toInt)
      val winners = time("winners localCheckpoint")(
        below.select("__rsk_id").unionByName(boundary.select("__rsk_id"))
          .localCheckpoint(true))
      time("recovery semi-join (count)")(
        w.filter(col("log_weight").isNotNull)
          .join(broadcast(winners), col("doc_id") === col("__rsk_id"), "left_semi")
          .count())
      keyed.unpersist(blocking = true)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
