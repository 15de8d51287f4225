package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Microbench for the per-row text kernels that gate most label/pref
  * queries' scan stage: times each annotator expression alone over the
  * documents table with a noop-style count action (guide §1.4), so the
  * scan-stage cost decomposes by kernel.
  *
  *   sbt "runMain graft.tools.ProfileText /root/testdata/sf0.1 [reps]"
  */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = graft.sources.TableIO.table(spark, sfDir, "documents")
      .select("doc_id", "text")
    val cases: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "baseline_len" -> length(col("text")),
      "tokenCount" -> TextFunctions.tokenCount(col("text")),
      "tokenStats" -> TextFunctions.tokenStats(col("text")).getField("n_tokens"),
      "qualityScore" -> TextFunctions.qualityScore(col("text")),
      "gopherPasses" -> graft.quality.GopherRules.passes(col("text")).cast("int"),
      "languageId" -> TextFunctions.languageId(col("text")),
      "fleschRE" -> TextFunctions.fleschReadingEase(col("text")),
      "stopwordCount" -> TextFunctions.stopwordCount(col("text")),
      "punctCount" -> TextFunctions.punctCount(col("text")),
      "lid_sum4" -> Seq("en", "es", "de", "fr")
        .map(l => TextFunctions.stopwordCount(col("text"), l))
        .reduce(_ + _),
      "lid_fold" -> {
        val scores = Seq("en", "es", "de", "fr")
          .map(l => l -> TextFunctions.stopwordCount(col("text"), l))
        val best = scores.tail.foldLeft((lit("en"), scores.head._2)) {
          case ((bl, bs), (l, s)) =>
            (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
        }
        when(best._2 > 0, best._1).otherwise("und")
      },
      "lid_rlike6" -> Seq("""[ぁ-ゟ゠-ヿ]""", """[가-힣]""", """[一-鿿]""",
          """[А-яЁё]""", """[؀-ۿ]""", """[ऀ-ॿ]""")
        .map(p => col("text").rlike(p).cast("int")).reduce(_ + _),
      "lid_hasNonAscii" -> graft.plans.HashExpressions.hasNonAscii(col("text")).cast("int"),
      "gopher_tokLower" -> size(transform(TextFunctions.tokens(col("text")), lower(_))),
      "gopher_lineFrac" -> {
        val lines = split(col("text"), "\n")
        size(filter(lines, _.rlike("""^\s*([-*•]|\d+[.)])\s+""")))
      },
      "gopher_alphaTok" -> size(filter(TextFunctions.tokens(col("text")), _.rlike("[A-Za-z]"))))
    // warm codegen
    cases.foreach { case (_, c) =>
      docs.select(sum(hash(c.cast("string")))).collect() }
    for ((name, c) <- cases) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        docs.select(sum(hash(c.cast("string")))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[text] $name%-14s min=${times.min}%6.3f s  (all: ${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
