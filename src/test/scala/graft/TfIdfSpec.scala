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

  test("bm25 matches a first-principles score and drops zero-match docs") {
    val corpus = Seq(
      (1L, "spark spark spark engine"),
      (2L, "spark engine engine engine engine engine"),
      (3L, "totally unrelated words here"),
      (4L, "spark")
    ).toDF("doc_id", "text")
    val out = TfIdf.bm25TopDocs(corpus, "doc_id", "text", Seq("spark"), k = 10)
      .select("doc_id", "dl", "score", "rk")
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(_._4)
    // doc 3 has no query term -> filtered out entirely.
    assert(out.map(_._1).toSet == Set(1L, 2L, 4L))
    // First-principles BM25 (k1=1.2, b=0.75): N=4, df(spark)=3,
    // avgdl=(4+6+4+1)/4.
    val n = 4.0; val df = 3.0; val avgdl = 15.0 / 4.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def s(tf: Double, dl: Double): Double =
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byDoc = out.map(r => r._1 -> r._3).toMap
    assert(math.abs(byDoc(1L) - s(3, 4)) < 1e-9)
    assert(math.abs(byDoc(2L) - s(1, 6)) < 1e-9)
    assert(math.abs(byDoc(4L) - s(1, 1)) < 1e-9)
    // Length normalization: doc 4 (tf=1, dl=1) outranks doc 2 (tf=1, dl=6).
    assert(byDoc(4L) > byDoc(2L))
    // rk is contiguous from 1 and ordered by score desc.
    assert(out.map(_._4) == Seq(1, 2, 3))
    assert(out.map(_._3) == out.map(_._3).sorted.reverse)
  }

  test("bm25 multi-term scores add per term and k caps the output") {
    val corpus = Seq(
      (1L, "alpha beta"),
      (2L, "alpha alpha"),
      (3L, "beta"),
      (4L, "gamma")
    ).toDF("doc_id", "text")
    val both = TfIdf.bm25TopDocs(corpus, "doc_id", "text", Seq("alpha", "beta"), k = 10)
    // doc 1 matches both terms; must rank above any single-term doc of
    // comparable length (doc 3 is shorter but single-term).
    val ranked = both.orderBy("rk").select("doc_id").as[Long].collect().toSeq
    assert(ranked.head == 1L)
    assert(!ranked.contains(4L))
    // k truncates deterministically.
    val top1 = TfIdf.bm25TopDocs(corpus, "doc_id", "text", Seq("alpha", "beta"), k = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(top1 == Seq(1L))
    // Duplicate/filth-case query terms collapse (no double counting).
    val dup = TfIdf.bm25TopDocs(corpus, "doc_id", "text", Seq("ALPHA", "alpha"), k = 10)
      .filter($"doc_id" === 2L).select("score").as[Double].head()
    val single = TfIdf.bm25TopDocs(corpus, "doc_id", "text", Seq("alpha"), k = 10)
      .filter($"doc_id" === 2L).select("score").as[Double].head()
    assert(dup == single)
    intercept[IllegalArgumentException](
      TfIdf.bm25TopDocs(corpus, "doc_id", "text", Seq.empty, k = 1))
  }

  test("rrfFuse: agreement beats single-list, sentinel 0 contributes nothing") {
    import graft.operators.HybridRetrieval
    // doc 1 ranks 2nd in both lists; doc 2 is 1st lexically only;
    // doc 3 is 1st in vector only; doc 4 trails in one list.
    val lex = Seq((2L, 1), (1L, 2), (4L, 3)).toDF("doc_id", "rk")
    val vec = Seq((3L, 1), (1L, 2)).toDF("doc_id", "vec_rk")
    val got = HybridRetrieval.rrfFuse(lex, "rk", vec, "vec_rk", "doc_id", rrfK = 60, k = 10)
      .select("doc_id", "lex_rk", "vec_rk", "rrf")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq
    // doc 1: 1/62 + 1/62; docs 2,3: 1/61; doc 4: 1/63
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(math.abs(got.head._4 - math.rint(2.0 / 62.0 * 1e6) / 1e6) < 1e-9)
    // absent list -> rank sentinel 0, no contribution
    assert(got(2) == ((3L, 0, 1, math.rint(1.0 / 61.0 * 1e6) / 1e6)))
    // equal scores tie-break on id: docs 2 and 3 both score 1/61
    assert(got(1)._1 == 2L && got(2)._1 == 3L && got(1)._4 == got(2)._4)
  }
}
