package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.SubstringDedup
import graft.sources.TableIO

/** Dev tool: stage-by-stage timing of the substring-dedup family —
  * where do the seconds go between gram explode, census, semi-join,
  * islands and the final sort.
  */
object ProfileSubstr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = TableIO.table(spark, sfDir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm codegen
    SubstringDedup.duplicatedSpans(
      TableIO.table(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 30, hashGrams = false).count()
    for (_ <- 1 to 2) {
      time("explode only (exact)")(
        docs.where(length(col("text")) >= 30)
          .select(col("doc_id"), col("text").as("__t"),
            explode(sequence(lit(1), length(col("text")) - 30 + 1)).as("p0"))
          .select(col("doc_id"), col("p0").cast("long").as("p"),
            col("__t").substr(col("p0"), lit(30)).as("g"))
          .count())
      time("census only (exact)")(
        SubstringDedup.gramCensus(docs, "doc_id", "text", 30, hashGrams = false).count())
      time("sites (exact)")(
        SubstringDedup.duplicatedGramSites(docs, "doc_id", "text", 30, hashGrams = false).count())
      time("spans (exact)")(
        SubstringDedup.duplicatedSpans(docs, "doc_id", "text", 30, hashGrams = false).count())
      time("spans+orderBy (exact, contract)")(
        SubstringDedup.duplicatedSpans(docs, "doc_id", "text", 30, hashGrams = false)
          .orderBy("doc_id", "span_start").count())
      time("sites (hashed)")(
        SubstringDedup.duplicatedGramSites(docs, "doc_id", "text", 30, hashGrams = true).count())
      time("spans (hashed)")(
        SubstringDedup.duplicatedSpans(docs, "doc_id", "text", 30, hashGrams = true).count())
      def sitesS = docs.where(length(col("text")) >= 30)
        .select(col("doc_id"), col("text").as("__t"),
          explode(sequence(lit(1), length(col("text")) - 30 + 1)).as("p0"))
        .select(col("doc_id"), col("p0").cast("long").as("p"),
          col("__t").substr(col("p0"), lit(30)).as("g"))
      time("sites exact: window count on g") {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
        sitesS.withColumn("n", count(lit(1)).over(w))
          .where(col("n") > 1).select(col("doc_id"), col("p")).count()
      }
      time("sites exact: collect_list per gram") {
        sitesS.groupBy(col("g"))
          .agg(count(lit(1)).as("n"),
            collect_list(struct(col("doc_id"), col("p"))).as("ss"))
          .where(col("n") > 1)
          .select(explode(col("ss")).as("s"))
          .select(col("s.doc_id"), col("s.p")).count()
      }
      time("sites exact: agg census + shuffle semi-join (no broadcast)") {
        val dup = sitesS.groupBy(col("g")).agg(count(lit(1)).as("n"))
          .where(col("n") > 1).select(col("g"))
          .hint("shuffle_hash")
        sitesS.join(dup, Seq("g"), "left_semi").select(col("doc_id"), col("p")).count()
      }
      println("[prof] ---")
    }
    spark.stop()
  }
}
