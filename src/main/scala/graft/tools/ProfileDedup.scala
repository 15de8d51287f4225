package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.Dedup
import graft.sources.TableIO

/** Dev profiler: stage-by-stage timings of the MinHash near-dup pipeline. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val docs = TableIO.table(spark, sfDir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("docs.count")(docs.count())
    val sig = docs.select(
      col("doc_id").as("id"),
      Dedup.minHashSignature(col("text"), 3, 32, 42L).as("sig"))
    time("signatures")(sig.count())
    val banded = sig.select(
      col("id"),
      posexplode(transform(
        sequence(lit(0), lit(15)),
        b => hash(slice(col("sig"), b * lit(2) + lit(1), lit(2))))).as(Seq("band", "band_hash")))
    time("banded rows")(println("[profile] n_banded = " + banded.count()))
    val a = banded.select(col("id").as("id_a"), col("band"), col("band_hash"))
    val b = banded.select(col("id").as("id_b"), col("band"), col("band_hash"))
    val joined = a.join(b, Seq("band", "band_hash")).filter(col("id_a") < col("id_b"))
    time("collision join")(println("[profile] n_collisions = " + joined.count()))
    time("collision distinct")(println("[profile] n_distinct = " +
      joined.select("id_a", "id_b").distinct().count()))
    val cands = Dedup.minHashCandidates(docs, "doc_id", "text", 3, 32, 16, 42L)
    time("candidates")(println("[profile] n_cands = " + cands.count()))
    val full = Dedup.minHashNearDuplicates(docs, "doc_id", "text", 3, 32, 16, 0.2, 42L)
    time("full near-dup")(println("[profile] n_pairs = " + full.count()))
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.2)
    time("exhaustive jaccard")(println("[profile] n_exact = " + jac.count()))
    spark.stop()
  }
}
