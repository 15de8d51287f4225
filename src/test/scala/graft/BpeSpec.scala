package graft

import graft.operators.Bpe
import graft.sources.TableIO

/** BPE merge training: the classic low/lower/newest/widest fixture with
  * hand-derived merge order, determinism, early stop, and encode
  * round-trip properties.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // low x5, lower x2, newest x6, widest x3 — Sennrich et al.'s example
  // shape. Hand-derived rounds (count desc, then lexicographic):
  //   (e,s)=9 -> (es,t)=9 -> (est,</w>)=9 -> (l,o)=7 -> (lo,w)=7
  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("learnMerges follows the hand-derived greedy order, deterministically") {
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", Bpe.EndOfWord, 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3, 4))
    // a second run is bit-identical (tie-breaks are total)
    assert(Bpe.learnMerges(corpus, "text", numMerges = 5) == merges)
  }

  test("early stop: no pair with count > 1 ends training before the budget") {
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(tiny, "text", numMerges = 50)
    assert(merges.isEmpty, s"all pairs are singletons: $merges")
  }

  test("encode applies merges in rank order; subwords reassemble the text") {
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 5)
    val enc = Bpe.encode(
        Seq((1L, "lowest newest low")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .collect().head
    val toks = enc.getSeq[String](1)
    // 'lowest' = low + est</w> — the published poster child
    assert(toks.take(2) == Seq("low", s"est${Bpe.EndOfWord}"), s"got $toks")
    assert(enc.getLong(2) == toks.length.toLong)
    // lossless: stripping sentinels and joining reassembles the words
    val rebuilt = toks.mkString("")
      .split(java.util.regex.Pattern.quote(Bpe.EndOfWord)).mkString(" ")
    assert(rebuilt == "lowest newest low")
    // more merges never increase the encoded length
    val enc2 = Bpe.encode(
        Seq((1L, "lowest newest low")).toDF("doc_id", "text"),
        "doc_id", "text", Bpe.learnMerges(corpus, "text", numMerges = 10))
      .collect().head.getLong(2)
    assert(enc2 <= enc.getLong(2))
  }

  test("batched rounds == one-merge-per-round reference, exactly") {
    // The r13 batching claim: accepting the maximal disjoint prefix per
    // pair-count pass reproduces sequential greedy bit-for-bit — ranks,
    // pairs, AND counts — on real text where batches actually form.
    val docs = TableIO.table(spark, Sf0001, "documents").limit(100)
    val batched = Bpe.learnMerges(docs, "text", numMerges = 20)
    val reference = Bpe.learnMerges(docs, "text", numMerges = 20, batchWindow = 1)
    assert(batched == reference)
  }

  test("corpus fixture: merges are deterministic and compress the encoding") {
    val docs = TableIO.table(spark, Sf0001, "documents").limit(100)
    val merges = Bpe.learnMerges(docs, "text", numMerges = 20)
    assert(merges.size == 20)
    assert(merges.map(_.rank) == (0 until 20))
    // merge counts are non-increasing-ish is NOT guaranteed by BPE
    // (merging creates new pairs), but every count must be > 1
    assert(merges.forall(_.count > 1))
    // encoding with the merges is shorter than character count
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    val chars = docs.selectExpr("sum(length(text))").collect().head.getLong(0)
    val sub = enc.selectExpr("sum(n_bpe_tokens)").collect().head.getLong(0)
    assert(sub < chars, s"subwords $sub must undercut chars $chars")
  }
}
