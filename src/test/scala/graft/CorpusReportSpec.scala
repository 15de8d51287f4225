package graft

import graft.operators.CorpusReport

class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  test("data card: hand-computed metrics, cross-source dup flags both sources") {
    val docs = Seq(
      (1L, "a", "one two three four"), // 4 tokens, 18 chars
      (2L, "a", "one two"), // 2 tokens
      (3L, "b", "ONE  TWO  THREE  FOUR"), // fingerprint-dup of doc 1 (case/ws)
      (4L, "b", "five six seven")) // unique
      .toDF("doc_id", "source", "text")
    val card = CorpusReport.dataCard(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

    assert(card(("a", "n_docs")) == 2.0)
    assert(card(("b", "n_docs")) == 2.0)
    assert(card(("a", "total_tokens")) == 6.0)
    assert(card(("b", "total_tokens")) == 7.0)
    assert(card(("a", "mean_doc_tokens")) == 3.0)
    // doc 1 and doc 3 share a normalized fingerprint -> one dup PER source
    assert(card(("a", "dup_doc_frac")) == 0.5)
    assert(card(("b", "dup_doc_frac")) == 0.5)
    // source a vocabulary: one,two,three,four = 4; ttr = 4/6
    assert(card(("a", "vocab_size")) == 4.0)
    assert(card(("a", "ttr")) == 0.666667)
    // every (source, metric) pair present exactly once
    assert(card.size == 2 * CorpusReport.Metrics.size)
  }

  test("lengthQuantiles: k-th order statistic by hand; sketch path agrees on fixture") {
    // source q: token counts 1..10 -> p50 = 5th smallest = 5,
    // p90 = ceil(9.0) = 9th = 9, p99 = ceil(9.9) = 10th = 10.
    val docs = (1 to 10).map(i => (i.toLong, "q", ("w " * i).trim))
      .toDF("doc_id", "source", "text")
    val got = CorpusReport.lengthQuantiles(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("q") == ((10L, 5L, 9L, 10L)))

    val real = graft.sources.TableIO.table(spark, Sf0001, "documents")
    val exact = CorpusReport.lengthQuantiles(real, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val approx = CorpusReport.lengthQuantiles(
        real, "doc_id", "text", "source", exact = false)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(exact == approx,
      "sketch is exact while per-source doc count < accuracy")

    intercept[IllegalArgumentException] {
      CorpusReport.lengthQuantiles(docs, "doc_id", "text", "source", qs = Seq(1.5))
    }
  }

  test("surprisal metric orders degenerate vs diverse sources sensibly") {
    val docs = (
      (1 to 20).map(i => (i.toLong, "rep", "same same same same same")) ++
        (1 to 20).map(i => (100L + i, "mix", s"unique$i word$i token$i item$i thing$i")))
      .toDF("doc_id", "source", "text")
    val card = CorpusReport.dataCard(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(card(("rep", "mean_surprisal")) < card(("mix", "mean_surprisal")),
      "repetitive source must score lower surprisal than diverse source")
    assert(card(("rep", "ttr")) < card(("mix", "ttr")))
  }
}
