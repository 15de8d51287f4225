package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.quality.GopherRules
import graft.quality.GopherRules.GopherConfig

/** Per-rule pinning of the Gopher §A1.1 battery: every rule has a doc
  * built to fail EXACTLY that rule (all other signals in range), so a
  * threshold or signal regression localizes to one test row.
  */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  /** 60 plain words incl. several required stopwords — passes every rule. */
  private val good: String =
    (1 to 10).map(_ => "the quick brown fox and that dog have fun").mkString(" ") +
      " with some more filler words here"

  private def signalsOf(docs: Seq[(Long, String)], cfg: GopherConfig = GopherConfig()) =
    GopherRules.signals(docs.toDF("doc_id", "text"), "doc_id", "text", cfg)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("good doc passes every rule") {
    val m = signalsOf(Seq(1L -> good))
    val r = m(1L)
    assert(r.getAs[Long]("gopher_pass") == 1L,
      s"expected pass, got $r")
    assert(r.getAs[Long]("n_words") >= 50)
    assert(r.getAs[Long]("stopword_hits") >= 2)
  }

  test("each failure mode flips exactly its own rule") {
    // One doc per rule; every doc keeps the other six signals in range.
    val tooShort = "the cat and that dog have fun with others here now"
    val longWords = (1 to 60)
      .map(i => s"the and supercalifragilistic$i expialidocious$i").mkString(" ")
    val symbolHeavy = good + " " + (1 to 12).map(_ => "#").mkString(" ")
    val bullets = (1 to 60).map(_ => "- the item and that thing is here now ok").mkString("\n")
    val ellipses =
      (1 to 30).map(i => s"the long sentence and that clause $i goes on...").mkString("\n") +
        "\n" + (1 to 10).map(i => s"the plain line with words $i").mkString("\n")
    val numeric = ((1 to 60).map(i => s"$i$i$i") ++
      Seq("the", "and", "that", "with")).mkString(" ")
    val salad = (1 to 60).map(i => s"zork$i blee$i").mkString(" ")

    val m = signalsOf(Seq(
      10L -> tooShort, 11L -> longWords, 12L -> symbolHeavy,
      13L -> bullets, 14L -> ellipses, 15L -> numeric, 16L -> salad))

    def only(id: Long, failed: String): Unit = {
      val r = m(id)
      val flags = Seq("words_ok", "word_len_ok", "symbol_ok", "bullet_ok",
        "ellipsis_ok", "alpha_ok", "stopword_ok")
      flags.foreach { f =>
        val v = r.getAs[Long](f)
        if (f == failed) assert(v == 0L, s"doc $id should fail $f: $r")
        else assert(v == 1L, s"doc $id should pass $f: $r")
      }
      assert(r.getAs[Long]("gopher_pass") == 0L)
    }
    only(10L, "words_ok")
    only(11L, "word_len_ok")
    only(12L, "symbol_ok")
    only(13L, "bullet_ok")
    only(14L, "ellipsis_ok")
    only(15L, "alpha_ok")
    only(16L, "stopword_ok")
  }

  test("unicode ellipsis counts for both symbol and line rules") {
    val m = signalsOf(Seq(
      20L -> (good + "…"),
      21L -> good))
    assert(m(20L).getAs[Double]("symbol_ratio") > 0.0)
    assert(m(20L).getAs[Double]("ellipsis_line_frac") == 1.0)
    assert(m(21L).getAs[Double]("symbol_ratio") == 0.0)
  }

  test("empty and whitespace-only docs yield zero signals, not nulls") {
    val m = signalsOf(Seq(30L -> "", 31L -> "   \n  "))
    Seq(30L, 31L).foreach { id =>
      val r = m(id)
      assert(r.getAs[Long]("n_words") == 0L)
      assert(r.getAs[Double]("mean_word_len") == 0.0)
      assert(r.getAs[Double]("symbol_ratio") == 0.0)
      assert(r.getAs[Double]("alpha_frac") == 0.0)
      assert(r.getAs[Long]("gopher_pass") == 0L)
    }
  }

  test("passes() gate column agrees with signals().gopher_pass") {
    val docs = Seq(
      1L -> good, 2L -> "short", 3L -> (good + " ### # ## # ## ## #"),
      4L -> (1 to 60).map(i => s"- the item and that thing $i").mkString("\n"))
      .toDF("doc_id", "text")
    val viaSignals = GopherRules.signals(docs, "doc_id", "text")
      .select(col("doc_id"), (col("gopher_pass") === 1L).as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaGate = docs
      .select(col("doc_id"), GopherRules.passes(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaSignals == viaGate)
  }

  test("thresholds are configurable") {
    val m = signalsOf(Seq(1L -> good), GopherConfig(minWords = 1000))
    assert(m(1L).getAs[Long]("words_ok") == 0L)
  }

  test("rollup: per-source survival and per-rule failure fractions") {
    val docs = Seq(
      (1L, good, "a"), (2L, good, "a"), (3L, "too short", "a"),
      (4L, good, "b"),
      (5L, (1 to 60).map(i => s"zork$i blee$i").mkString(" "), "b"))
      .toDF("doc_id", "text", "source")
    val got = GopherRules.rollup(
        GopherRules.signals(docs.select("doc_id", "text"), "doc_id", "text"),
        docs, "doc_id", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_docs") == 3L && a.getAs[Long]("n_pass") == 2L)
    assert(a.getAs[Double]("pass_frac") == 0.666667)
    assert(a.getAs[Double]("fail_words") == 0.333333)
    // "too short" has no required stopwords either ("too" != "to")
    assert(a.getAs[Double]("fail_stopword") == 0.333333)
    assert(a.getAs[Double]("fail_symbol") == 0.0)
    val b = got("b")
    assert(b.getAs[Long]("n_docs") == 2L && b.getAs[Long]("n_pass") == 1L)
    assert(b.getAs[Double]("fail_stopword") == 0.5)
  }
}
