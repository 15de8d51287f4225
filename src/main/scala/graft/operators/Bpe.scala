package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BYTE-PAIR-ENCODING merge TRAINING over a corpus — learn the
  * tokenizer FROM the data (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"), Spark-first:
  *
  * The classic algorithm is a greedy fixpoint (count adjacent symbol
  * pairs, merge the most frequent, repeat), which looks sequential —
  * but all the corpus-sized work collapses into ONE aggregation: BPE
  * pair counts depend only on the DISTINCT WORD FORMS and their
  * frequencies (merges never cross word boundaries), so a 100 TB corpus
  * reduces to a word-frequency table (Heaps-law-bounded, ~millions of
  * rows) before the first merge round. Each round then runs on that
  * table: one pair-count aggregation (map-side combined), a one-row
  * argmax to the driver (count desc, then lexicographic — fully
  * deterministic), and a row-local higher-order `aggregate` that
  * rewrites each word's symbol array. Rounds localCheckpoint like the
  * connected-components fixpoint so plan depth stays constant.
  *
  * Word boundary marker: the END-of-word sentinel `</w>` is appended as
  * its own symbol (the published formulation), so "low" trains as
  * l o w </w> and learned units distinguish word-final from word-internal
  * positions.
  */
object Bpe {

  val EndOfWord = "</w>"

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** The word-frequency table BPE actually trains on: (word, freq). */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbolization: characters plus the end-of-word sentinel. */
  private def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** Merge every non-overlapping (left, right) adjacency in a symbol
    * array, left to right — one higher-order aggregate, no UDF: the
    * fold state is the rebuilt array; when its last element is `left`
    * and the incoming symbol is `right`, the pair fuses.
    */
  private def mergePair(syms: Column, left: String, right: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, s) =>
        when(
          size(acc) > 0 &&
            element_at(acc, -1) === lit(left) && s === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(s))))

  /** Learn `numMerges` BPE merges from the corpus. Returns the ordered
    * merge table (rank, left, right, count) — rank is application
    * order. Deterministic: ties on count break lexicographically on
    * (left, right). Stops early when no adjacent pair occurs twice.
    *
    * Batched rounds, greedy-EXACT (the r12 verdict's merge-loop cost
    * item): one pair-count pass per round used to be one pass per
    * MERGE. Each round collects the top `batchWindow` pairs and accepts
    * the maximal sorted PREFIX that is (a) pairwise symbol-disjoint and
    * (b) past the first element, strictly above every count that could
    * still interfere. This reproduces sequential greedy exactly:
    *   - a disjoint pair's count is invariant under the earlier merges
    *     in the batch (no shared symbol ⇒ no shared adjacency), so its
    *     recount in true greedy equals the count already in hand;
    *   - pairs CONFLICTING with an accepted merge can both shrink and
    *     spawn new pairs around the fused symbol, and every new pair's
    *     count is bounded by some conflicting pair's old count — so the
    *     prefix STOPS at the first conflict, and later accepts must be
    *     strictly above the collection cutoff (an unseen, sub-window
    *     pair could otherwise tie a new pair into a lex race);
    *   - ties WITHIN the accepted prefix replay in (count desc, lex)
    *     order — exactly greedy's tie-break.
    * Batch identity vs the one-merge-per-round reference is spec-pinned
    * (BpeSpec) on top of the hand-derived fixture sequence.
    */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      batchWindow: Int = 64): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(batchWindow >= 1, s"batchWindow must be >= 1, got $batchWindow")
    var words = wordFrequencies(df, textCol)
      .select(initialSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // adjacent pairs of each distinct word, weighted by word freq
      val top = words
        .select(
          posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1)).as(Seq("i", "l")),
          col("syms"), col("freq"))
        .select(
          col("l"),
          element_at(col("syms"), col("i") + 2).as("r"),
          col("freq"))
        .groupBy("l", "r").agg(sum(col("freq")).as("n"))
        .where(col("n") > 1)
        .orderBy(desc("n"), asc("l"), asc("r"))
        .limit(batchWindow).collect()
      if (top.isEmpty) done = true
      else {
        // Counts at or below the cutoff may hide unseen pairs that can
        // bound a new pair into a tie; a full (sub-window) table has no
        // unseen pairs, so the guard vanishes.
        val cutoff = if (top.length == batchWindow) top.last.getLong(2) else 0L
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
        var stop = false
        var i = 0
        while (i < top.length && !stop && rank + accepted.size < numMerges) {
          val (l, r, n) = (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          if (accepted.isEmpty) { accepted += ((l, r, n)); used += l; used += r }
          else if (used(l) || used(r) || n <= cutoff) stop = true
          else { accepted += ((l, r, n)); used += l; used += r }
          i += 1
        }
        accepted.foreach { case (l, r, n) => merges += Merge(rank, l, r, n); rank += 1 }
        // One rewrite job applies the whole batch: disjoint merges
        // neither create nor destroy each other's adjacencies, so the
        // composed fold equals sequential application.
        val rewritten = accepted.foldLeft(col("syms")) { case (c, (l, r, _)) =>
          mergePair(c, l, r)
        }
        val next = words
          .select(rewritten.as("syms"), col("freq"))
          .localCheckpoint(true)
        words.unpersist()
        words = next
      }
    }
    words.unpersist()
    merges.toList
  }

  /** Encode a text column with a learned merge table: one row per
    * document, `bpe_tokens` = the subword sequence, `n_bpe_tokens` its
    * length. The merge list is driver-sized (the vocabulary budget), so
    * application runs partition-local over a broadcast of it — the same
    * shape a production tokenizer pass has.
    */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right)).toArray
    val bc = spark.sparkContext.broadcast(ordered)
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        // Per-partition word -> subwords memo (bounded): word forms are
        // Zipf-repeated, so most encodes are a hash probe — the cache a
        // production tokenizer keeps. Output is cache-independent (each
        // word encodes from scratch on miss), so results are identical
        // with or without hits.
        val memo = new java.util.HashMap[String, Array[String]](1 << 12)
        def encodeWord(w: String): Array[String] = {
          val hit = memo.get(w)
          if (hit != null) return hit
          val sentinel = w + EndOfWord
          var syms = (w.map(_.toString) :+ EndOfWord).toArray
          ms.foreach { case (l, r) =>
            // A merge can only apply if its fused chars appear
            // contiguously in the original word+sentinel — skip the
            // rewrite scan otherwise (most merges miss most words).
            if (syms.length > 1 && sentinel.contains(l + r)) {
              val acc = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (acc.nonEmpty && acc.last == l && syms(i) == r) {
                  acc(acc.length - 1) = l + r
                } else acc += syms(i)
                i += 1
              }
              syms = acc.toArray
            }
          }
          if (memo.size < 200000) memo.put(w, syms)
          syms
        }
        it.map { case (id, t) =>
          val toks = t.split("\\s+").filter(_.nonEmpty)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          toks.foreach(w => out ++= encodeWord(w))
          (id, out.toSeq, out.length.toLong)
        }
      }
      .toDF("id", "bpe_tokens", "n_bpe_tokens")
      .withColumnRenamed("id", idCol)
  }
}
