package graft

import org.apache.spark.sql.functions._

import graft.operators.LineDedup

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha one\nFOOTER\nbeta two"),
    (2L, "gamma three\nFOOTER\ndelta four"),
    (3L, "FOOTER\nepsilon five"),
    (4L, "FOOTER")) // all-boilerplate doc
    .toDF("doc_id", "text")

  test("duplicatedLines inventories the footer with site and doc counts") {
    val got = LineDedup.duplicatedLines(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("FOOTER", 4L, 4L)))
  }

  test("dropAll strips every footer occurrence, preserves order, keeps empties") {
    val got = LineDedup.stripDuplicatedLines(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "alpha one\nbeta two")
    assert(got(2L) == "gamma three\ndelta four")
    assert(got(3L) == "epsilon five")
    assert(got(4L) == "", "all-boilerplate doc survives as empty, not dropped")
  }

  test("keepFirst leaves exactly the lowest (doc_id, line_idx) occurrence") {
    val got = LineDedup.stripDuplicatedLines(docs, "doc_id", "text", keepFirst = true)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "alpha one\nFOOTER\nbeta two")
    assert(got(2L) == "gamma three\ndelta four")
    assert(got(3L) == "epsilon five")
    assert(got(4L) == "")
  }

  test("paragraph separator: same operator at paragraph grain") {
    val paras = Seq(
      (1L, "first para\n\nSHARED AD\n\nlast para"),
      (2L, "SHARED AD\n\nunique body")).toDF("doc_id", "text")
    val got = LineDedup.stripDuplicatedLines(paras, "doc_id", "text", sep = "\n\n")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "first para\n\nlast para")
    assert(got(2L) == "unique body")
  }

  test("dropAll plan has no window; lines explode feeds a census anti-join") {
    val plan = LineDedup.stripDuplicatedLines(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"dropAll must not use a window:\n$plan")
  }

  test("dedupLinesInDoc: row-local first-occurrence keep, order preserved") {
    val got = Seq(
      (1L, "a\nb\na\nc\nb"),
      (2L, "x"),
      (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), LineDedup.dedupLinesInDoc(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "a\nb\nc")
    assert(got(2L) == "x")
    assert(got(3L) == "")
    // cross-doc state is NOT consulted: doc 2's "x" untouched even
    // though doc 1 could contain it too — pinned by construction above.
  }

  test("in-doc dedup agrees with the keepFirst operator restricted to one doc") {
    val one = Seq((7L, "m\nn\nm\nm\no\nn")).toDF("doc_id", "text")
    val viaOp = LineDedup.stripDuplicatedLines(one, "doc_id", "text", keepFirst = true)
      .as[(Long, String)].collect().head._2
    val viaCol = one.select(LineDedup.dedupLinesInDoc(col("text")))
      .as[String].collect().head
    assert(viaOp == viaCol)
  }
}
