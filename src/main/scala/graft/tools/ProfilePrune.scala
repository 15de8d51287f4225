package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.CorpusStats
import graft.sources.TableIO

/** Dev tool: the pruned-census SIZE vs SCORE-DRIFT curve behind
  * [[graft.operators.CorpusStats.pruneCensus]]'s docstring numbers —
  * census rows kept and mean per-doc |Δ surprisal| at each count
  * cutoff, for the bigram and trigram stores.
  */
object ProfilePrune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = TableIO.table(spark, sfDir, "documents").select("doc_id", "text")
    val uni = CorpusStats.tokenCensus(docs, "text").persist()
    val bi = CorpusStats.bigramCensus(docs, "doc_id", "text").persist()
    val tri = CorpusStats.trigramCensus(docs, "doc_id", "text").persist()
    println(s"[prune] docs=${docs.count()} uni=${uni.count()} " +
      s"bi=${bi.count()} tri=${tri.count()}")

    def drift(kind: String, scoreAt: Long => org.apache.spark.sql.DataFrame,
        rowsAt: Long => Long): Unit = {
      val base = scoreAt(1L).withColumnRenamed("avg_surprisal", "s0")
      val mean0 = base.agg(avg(col("s0"))).head().getDouble(0)
      for (mc <- Seq(2L, 3L, 5L)) {
        val pr = scoreAt(mc)
        val d = base.join(pr, "doc_id")
          .agg(avg(abs(col("avg_surprisal") - col("s0"))).as("d"))
          .head().getDouble(0)
        println(f"[prune] $kind minCount=$mc rows=${rowsAt(mc)} " +
          f"meanAbsDrift=$d%.4f bits (corpus mean $mean0%.2f)")
      }
    }
    drift("bigram",
      mc => CorpusStats.bigramSurprisalAgainstCensus(
        docs, "doc_id", "text", uni, CorpusStats.pruneCensus(bi, mc)),
      mc => CorpusStats.pruneCensus(bi, mc).count())
    drift("trigram",
      mc => CorpusStats.trigramSurprisalAgainstCensus(
        docs, "doc_id", "text", uni, bi, CorpusStats.pruneCensus(tri, mc)),
      mc => CorpusStats.pruneCensus(tri, mc).count())

    // The fixture vocabulary is ~31 words — no Zipf tail, so the curve
    // above under-states pruning. Re-run on a synthetic Zipf(1) corpus
    // (log-uniform rank => p(rank r) ∝ 1/r over a 50k vocabulary,
    // md5-deterministic): the shape real prose censuses have.
    val zipf = spark.range(20000).toDF("doc_id")
      .select(col("doc_id"), concat_ws(" ",
        (0 until 100).map { p =>
          val u = conv(substring(md5(concat_ws("_", col("doc_id"), lit(p))), 1, 13), 16, 10)
            .cast("double") / lit(math.pow(2, 52))
          concat(lit("w"), ceil(exp(u * math.log(50000.0))).cast("long"))
        }: _*).as("text"))
      .persist()
    val zuni = CorpusStats.tokenCensus(zipf, "text").persist()
    val zbi = CorpusStats.bigramCensus(zipf, "doc_id", "text").persist()
    val ztri = CorpusStats.trigramCensus(zipf, "doc_id", "text").persist()
    println(s"[prune] ZIPF docs=${zipf.count()} uni=${zuni.count()} " +
      s"bi=${zbi.count()} tri=${ztri.count()}")
    def zdrift(kind: String, scoreAt: Long => org.apache.spark.sql.DataFrame,
        rowsAt: Long => Long): Unit = {
      val base = scoreAt(1L).withColumnRenamed("avg_surprisal", "s0")
      val mean0 = base.agg(avg(col("s0"))).head().getDouble(0)
      for (mc <- Seq(2L, 3L, 5L)) {
        val d = base.join(scoreAt(mc), "doc_id")
          .agg(avg(abs(col("avg_surprisal") - col("s0"))).as("d"))
          .head().getDouble(0)
        println(f"[prune] ZIPF $kind minCount=$mc rows=${rowsAt(mc)} " +
          f"meanAbsDrift=$d%.4f bits (corpus mean $mean0%.2f)")
      }
    }
    zdrift("bigram",
      mc => CorpusStats.bigramSurprisalAgainstCensus(
        zipf, "doc_id", "text", zuni, CorpusStats.pruneCensus(zbi, mc)),
      mc => CorpusStats.pruneCensus(zbi, mc).count())
    zdrift("trigram",
      mc => CorpusStats.trigramSurprisalAgainstCensus(
        zipf, "doc_id", "text", zuni, zbi, CorpusStats.pruneCensus(ztri, mc)),
      mc => CorpusStats.pruneCensus(ztri, mc).count())
    spark.stop()
  }
}
