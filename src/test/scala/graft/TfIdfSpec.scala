package graft

import graft.operators.TfIdf

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "zebra zebra zebra common common"),
    (2L, "common words only appear here"),
    (3L, "common words again and again")
  ).toDF("doc_id", "text")

  test("rare repeated terms outrank corpus-wide terms") {
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getString(1), r.getLong(2)))
      .toMap
    // doc 1: zebra (tf 3, df 1) must beat common (tf 2, df 3).
    assert(top((1L, 1)) == ("zebra", 3L))
    assert(top((1L, 2)) == ("common", 2L))
    // doc 3: again (tf 2, df 1) ranks first.
    assert(top((3L, 1)) == ("again", 2L))
  }

  test("ties break on term ascending and k bounds each doc's rows") {
    // doc 2: four singleton terms with equal df=1 tie on score -> the
    // lexicographically first two win at k=2.
    val doc2 = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .filter($"doc_id" === 2L).orderBy("rk")
      .select("term").as[String].collect().toSeq
    assert(doc2 == Seq("appear", "here"))
    val counts = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ <= 2))
    intercept[IllegalArgumentException](TfIdf.topTerms(docs, "doc_id", "text", k = 0))
  }

  test("corpus run matches a locally computed tf-idf on a sample doc") {
    val corpus = graft.sources.TableIO.table(spark, Sf0001, "documents")
    val out = TfIdf.topTerms(corpus, "doc_id", "text", k = 3)
    val n = corpus.count()
    // Recompute one doc's expected winner from first principles.
    val docText = corpus.filter($"doc_id" === 1L).select("text").as[String].head()
    val terms = docText.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    assert(terms.nonEmpty)
    val got = out.filter($"doc_id" === 1L).orderBy("rk")
      .select("term", "tf").as[(String, Long)].collect()
    assert(got.length == 3)
    // Every reported tf equals the doc's actual term count.
    val counts = terms.groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (term, tf) => assert(counts(term) == tf, s"tf of '$term'") }
    assert(out.count() <= n * 3)
  }

  test("case folding merges tokens; empty docs vanish") {
    val mixed = Seq((1L, "Word word WORD"), (2L, "   ")).toDF("doc_id", "text")
    val rows = TfIdf.topTerms(mixed, "doc_id", "text", k = 3).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(1) == "word" && rows.head.getLong(2) == 3L)
  }
}
