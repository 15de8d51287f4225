package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sliding-window document chunking — the prep step that turns raw
  * documents into training sequences / retrieval passages: each document
  * becomes ⌈(n_tok − window)/stride⌉ + 1 overlapping windows of at most
  * `window` tokens, advancing `stride` tokens per chunk (overlap =
  * window − stride).
  *
  * Scale shape: tokenize + explode is strictly row-local — one
  * generator per input row, no shuffle, no state — so the operator is
  * a single narrow stage over 100 TB and the output inherits the
  * input's partitioning (downstream shuffles see the exploded size, so
  * callers repartition AFTER chunking only if the fan-out factor is
  * large). Token arithmetic is integer-only, making the chunk
  * boundaries bit-reproducible in any engine.
  */
object Chunker {

  /** Chunk `textCol` into token windows. Output: (idCol, carryCols...,
    * chunk_id, n_chunk_tokens, chunk_text), one row per chunk; empty
    * documents produce zero rows; documents with ≤ `window` tokens
    * produce exactly one chunk. The final chunk may be shorter than
    * `window` but is never empty, and every token is covered by ≥ 1
    * chunk. `carryCols` ride along through the explode — at scale this
    * beats re-joining document metadata onto the (much larger) chunk
    * set afterwards.
    */
  def chunkDocuments(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int,
      stride: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = TextFunctions.tokens(col(textCol))
    val nTok = size(toks)
    // Integer ceil-division keeps the chunk count exact in IEEE-free
    // arithmetic: 1 + (nTok - window + stride - 1) / stride for
    // overfull docs, 1 for 0 < nTok <= window, 0 when empty.
    val nChunks = when(nTok <= 0, lit(0))
      .when(nTok <= window, lit(1))
      .otherwise(((nTok - lit(window) + lit(stride - 1)) / lit(stride)).cast("int") + lit(1))
    val ids = when(nChunks > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    val carried = carryCols.map(col)
    df.select(col(idCol) +: carried ++: Seq(
        toks.as("__toks"), nTok.as("__n"), explode(ids).as("chunk_id")): _*)
      .select(
        col(idCol) +: carried ++: Seq(
          col("chunk_id"),
          least(lit(window), col("__n") - col("chunk_id") * stride).as("n_chunk_tokens"),
          array_join(
            slice(col("__toks"), col("chunk_id") * stride + 1, lit(window)),
            " ").as("chunk_text")): _*)
  }
}
