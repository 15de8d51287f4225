package graft

import org.apache.spark.sql.functions.col

import graft.operators.Chunker

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, window: Int, stride: Int): Seq[(Int, Int, String)] =
    Chunker.chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", window, stride)
      .orderBy("chunk_id")
      .select(col("chunk_id"), col("n_chunk_tokens"), col("chunk_text"))
      .collect().toSeq.map(r => (r.getInt(0), r.getInt(1), r.getString(2)))

  test("overlapping windows cover every token; last chunk may be short") {
    val c = chunks("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", window = 4, stride = 3)
    assert(c == Seq(
      (0, 4, "t0 t1 t2 t3"),
      (1, 4, "t3 t4 t5 t6"),
      (2, 4, "t6 t7 t8 t9")))
  }

  test("short and empty documents") {
    assert(chunks("a b c", window = 4, stride = 3) == Seq((0, 3, "a b c")))
    assert(chunks("a b c d", window = 4, stride = 3) == Seq((0, 4, "a b c d")))
    assert(chunks("", window = 4, stride = 3).isEmpty)
    assert(chunks("   ", window = 4, stride = 3).isEmpty)
  }

  test("stride == window gives disjoint chunks; ragged tail kept") {
    val c = chunks("a b c d e", window = 2, stride = 2)
    assert(c == Seq((0, 2, "a b"), (1, 2, "c d"), (2, 1, "e")))
  }

  test("carryCols ride through the explode unchanged") {
    val df = Seq((1L, "web", "a b c d e"), (2L, "books", "x y")).toDF("doc_id", "source", "text")
    val got = Chunker.chunkDocuments(df, "text", "doc_id", window = 2, stride = 2, carryCols = Seq("source"))
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "source", "chunk_id", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1L, "web", 0, "a b"), (1L, "web", 1, "c d"), (1L, "web", 2, "e"),
      (2L, "books", 0, "x y")))
  }

  test("every token covered at least once across a range of shapes") {
    for (n <- Seq(1, 5, 63, 64, 65, 100, 130); (w, s) <- Seq((64, 48), (16, 16), (10, 3))) {
      val text = (0 until n).map(i => s"w$i").mkString(" ")
      val got = chunks(text, w, s)
      val covered = got.flatMap(_._3.split(" ")).toSet
      assert(covered == (0 until n).map(i => s"w$i").toSet, s"n=$n w=$w s=$s")
      // chunk count matches the closed form
      val expect = if (n <= w) 1 else 1 + (n - w + s - 1) / s
      assert(got.size == expect, s"n=$n w=$w s=$s")
      // token counts are consistent with the text
      got.foreach { case (_, k, t) => assert(t.split(" ").length == k) }
    }
  }
}
