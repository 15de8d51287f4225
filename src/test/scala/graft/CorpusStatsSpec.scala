package graft

import org.apache.spark.sql.functions.col

import graft.operators.CorpusStats

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("gramDocFrequency counts distinct-gram document frequency exactly") {
    val docs = Seq(
      (1L, "a b c d"),        // grams: "a b c", "b c d"
      (2L, "a b c x"),        // grams: "a b c", "b c x"
      (3L, "a b c d"),        // same as doc 1
      (4L, "z z z z z"),      // grams: "z z z" (x3 -> 1 distinct)
      (5L, "q r")             // < 3 tokens: no grams
    ).toDF("doc_id", "text")
    val got = CorpusStats.gramDocFrequency(docs, "doc_id", "text", n = 3, minDf = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // "a b c" df=3, "b c d" df=2, "b c x" df=1, "z z z" df=1
    assert(got == Seq(
      (1L, 2L, 2L, 1.0),
      (2L, 2L, 1L, 0.5),
      (3L, 2L, 2L, 1.0),
      (4L, 1L, 0L, 0.0),
      (5L, 0L, 0L, 0.0)))
  }

  test("minDf = 1 marks every gram common; empty corpus-side parity holds") {
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val got = CorpusStats.gramDocFrequency(docs, "doc_id", "text", n = 3, minDf = 1)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .toSeq
    assert(got == Seq((1L, 1L, 1.0), (2L, 0L, 0.0)))
  }
}
