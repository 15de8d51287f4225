package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level TF-IDF: score terms against the whole corpus and keep
  * each document's top-k — keyword extraction / salient-term features
  * for routing, clustering labels, or index enrichment.
  *
  * Scale shape: one explode + two hash aggregations (term frequency per
  * doc, document frequency per term) + a broadcast of the 1-row corpus
  * count; the per-doc top-k is a rank window partitioned by doc — no
  * global sort. The document-frequency table is vocabulary-sized;
  * Catalyst/AQE broadcast it when small and shuffle-join otherwise.
  */
object TfIdf {

  /** Top-k terms per document by smoothed TF-IDF
    * (idf = ln((N+1)/(df+1)) + 1, sklearn-style smoothing — never
    * zero, never divides by zero). Scores round to 6dp BEFORE ranking
    * so ties (and their `term`-ascending tie-break) are reproducible
    * across engines. Output: doc_id, term, tf, score, rk.
    */
  def topTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val toks = df.select(
      col(idCol).as("doc_id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // Document frequency derives from the tf table (one row per
    // (doc, term)). Catalyst deliberately does NOT share the physical
    // stage: it prunes the unused count from this branch, reducing it to
    // a distinct-aggregate over its own column-pruned scan — two
    // parallel scans beat materializing an exploded token table, and
    // pinning reuse here would fight the optimizer's (correct) choice.
    val dft = tf.groupBy("term").agg(count(lit(1)).as("dft"))
    val total = df.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(dft, "term")
      .crossJoin(broadcast(total))
      .withColumn("score",
        round(col("tf") * (log((col("n_docs") + 1.0) / (col("dft") + 1.0)) + 1.0), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("doc_id", "term", "tf", "score", "rk")
  }

  /** Okapi BM25 top-k documents for a fixed bag of query terms —
    * lexical retrieval over the corpus (the classic complement to the
    * embedding ANN paths in [[SimilaritySearch]]).
    *
    * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (Robertson/Lucene form,
    * non-negative), score(d) = Σ_t idf(t)·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)).
    * Scores round to 6dp BEFORE ranking so ties (broken doc_id-ascending)
    * are reproducible across engines.
    *
    * Scale shape: per-doc term frequencies come from
    * `size(filter(tokens, _ == term))` per query term — ONE corpus scan,
    * no explode, no shuffle on the big side. The corpus statistics
    * (N, Σdl, df per term) reduce to a single 1-row aggregate that is
    * broadcast back; the final top-k is `orderBy().limit(k)` which Spark
    * plans as TakeOrderedAndProject (per-partition heaps + driver merge
    * of k·partitions rows — no global sort, no single-partition window).
    * At 100 TB this is one pass over the text column plus k rows moved.
    */
  def bm25TopDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = filter(
      split(lower(trim(col(textCol))), "\\s+"), t => t =!= "")
    // One row per doc: length + a tf column per query term (single scan).
    val perDoc = df.select(
      col(idCol).as("doc_id") +:
        size(toks).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("double").as(s"tf_$i")
        }: _*)
    // Corpus statistics: one 1-row aggregate, broadcast back.
    val stats = perDoc.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).cast("double").as("sum_dl") +:
        terms.indices.map { i =>
          sum(when(col(s"tf_$i") > 0, 1.0).otherwise(0.0)).as(s"df_$i")
        }: _*)
    val avgdl = col("sum_dl") / col("n_docs")
    val score = terms.indices.map { i =>
      val tf  = col(s"tf_$i")
      val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      idf * tf * (k1 + 1.0) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    }.reduce(_ + _)
    val scored = perDoc
      .crossJoin(broadcast(stats))
      .withColumn("score", round(score, 6))
      .filter(col("score") > 0.0)
      .select(col("doc_id"), col("dl").cast("long").as("dl"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    // Constant partition key: the window input is the ≤ k-row post-limit
    // candidate list, so single-partition evaluation is the point — the
    // key states that intent and keeps WindowExec from warning about an
    // (irrelevant here) global-sort degradation. pmod(id, 1) = 0 per
    // row but is non-foldable, surviving Spark 4's
    // EliminateWindowPartitions where a bare lit(0) would not.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("doc_id"), lit(1)))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
  }
}
