package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED INVERTED INDEX for incremental BM25 retrieval — the
  * retrieval sibling of the census-probe family ([[CensusStore]],
  * [[SubstringDedup]]'s gram census): build the index once for the
  * standing corpus, append a delta per ingested batch, and answer
  * queries against the STANDING store without ever rescanning corpus
  * text. [[TfIdf.bm25TopDocs]] stays the one-shot form (one corpus
  * scan, no state); this is the shape a corpus that answers many
  * queries — or grows continuously — actually wants.
  *
  * Store layout under `path` (all writes OVERWRITE a deterministic
  * `delta=<batchId>` dir — streaming replays rewrite identical bytes):
  *   - `postings/delta=<id>`: (term, doc_id, tf, dl) — doc length
  *     DENORMALIZED onto each posting, so a probe touches ONLY the
  *     postings of its query terms plus the two tiny stores below;
  *     no doc-level join at all (+8 bytes/posting for it);
  *   - `termdf/` ([[CensusStore]], key `term`): document frequencies.
  *     Batches hold disjoint docs, so df is a count monoid and the
  *     store compacts/fold-watermarks like any census;
  *   - `stats/delta=<id>`: one (n_docs, sum_dl) row per batch — the
  *     corpus stats fold as a 2-field sum, read as a tiny aggregate.
  *
  * Probe cost is proportional to the MATCHED postings: the term filter
  * pushes down to the postings parquet scan (`PushedFilters: In(term)`),
  * the per-term df/idf constants come from a few termdf rows, and the
  * top-k is TakeOrderedAndProject. Nothing scans doc-level data.
  *
  * Score parity: identical formula and 6dp-round-then-rank discipline
  * as [[TfIdf.bm25TopDocs]] — and identical float SUMMATION ORDER:
  * per-term contributions aggregate into separate columns (each an
  * exact ≤1-element sum) and add LEFT-ASSOCIATIVELY in query-term
  * order, because a plain groupBy-sum over posting rows would add
  * doubles in partition order and flip 6dp roundings. Probing a store
  * holding exactly the one-shot operator's corpus returns its exact
  * rows (the restriction-law contract queries share q_bm25_topk's
  * oracle SQL verbatim).
  */
object RetrievalIndex {

  private def tokens(textCol: String) =
    filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= "")

  /** Tokenize one batch of documents into the three delta stores.
    * Idempotent per (path, batchId); batches must carry DISJOINT doc
    * sets (the df/stats monoids assume it — same discipline as every
    * delta store in the engine).
    */
  def appendBatch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      batchId: Long): Unit = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    val toks = docs.select(
      col(idCol).as("doc_id"), tokens(textCol).as("__t"))
    val postings = toks
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    postings.write.mode(SaveMode.Overwrite).parquet(s"$path/postings/delta=$batchId")
    CensusStore.appendDelta(
      postings.groupBy(col("term")).agg(count(lit(1)).as("n")),
      s"$path/termdf", batchId)
    toks.select(size(col("__t")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats/delta=$batchId")
  }

  /** BM25 top-k against the standing store. Same formula, rounding and
    * tie-break as [[TfIdf.bm25TopDocs]].
    */
  def bm25TopK(
      spark: SparkSession,
      path: String,
      queryTerms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val statsRow = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head()
    val nDocs = statsRow.getLong(0).toDouble
    val sumDl = statsRow.getLong(1).toDouble
    val avgdl = sumDl / nDocs
    // df per query term: a handful of termdf rows -> driver map.
    val dfByTerm = CensusStore.read(spark, s"$path/termdf", "term")
      .where(col("term").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val matched = spark.read.parquet(s"$path/postings")
      .where(col("term").isin(terms: _*))
    // Per-term contribution columns (each doc has <= 1 posting per
    // term, so the per-term sum is exact), then left-associative add in
    // term order — float parity with the one-shot operator.
    val contrib = terms.zipWithIndex.map { case (t, i) =>
      val dfT = dfByTerm.getOrElse(t, 0L).toDouble
      val idf = math.log(1.0 + (nDocs - dfT + 0.5) / (dfT + 0.5))
      val tf = sum(when(col("term") === t, col("tf").cast("double"))).as(s"__tf_$i")
      (i, idf, tf)
    }
    val perDoc = matched
      .groupBy(col("doc_id"))
      .agg(first(col("dl")).as("dl"), contrib.map(_._3): _*)
    val score = contrib.map { case (i, idf, _) =>
      val tf = coalesce(col(s"__tf_$i"), lit(0.0))
      lit(idf) * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    }.reduce(_ + _)
    val scored = perDoc
      .withColumn("score", round(score, 6))
      .filter(col("score") > 0.0)
      .select(col("doc_id"), col("dl").cast("long").as("dl"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("doc_id"), lit(1)))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
  }

  /** Maintain the index continuously from a document stream: one
    * [[appendBatch]] per micro-batch (replay-safe: deterministic delta
    * dirs, overwrite).
    */
  def indexSink(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        appendBatch(batch.toDF(), idCol, textCol, path, id)
      }
      .start()
}
