package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.sources.TableIO

/** Dev profiler: where does exact-Jaccard wall-clock go at small sf. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(32)
    val docs = TableIO.table(spark, sfDir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("docs.count warm")(docs.count())
    time("tokens only")(docs.select(explode(TextFunctions.tokens(col("text")))).count())
    time("ngrams array")(docs.select(TextFunctions.wordNGrams(col("text"), 3)).count())
    time("ngrams explode")(docs.select(explode(TextFunctions.wordNGrams(col("text"), 3))).count())
    val grams = Dedup.ngramSets(docs, "doc_id", "text", 3)
    time("ngramSets distinct")(grams.count())
    time("ngramSets again (no persist)")(grams.count())
    for (run <- 1 to 3) {
      time(s"jaccardPairs run $run")(
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.2).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
