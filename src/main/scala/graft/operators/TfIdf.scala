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
}
