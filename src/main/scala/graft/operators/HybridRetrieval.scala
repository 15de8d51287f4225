package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion: combine a lexical ranking (BM25) and a
  * vector ranking (cosine ANN) with reciprocal-rank fusion —
  * rrf(d) = Σ_r 1/(rrfK + rank_r(d)) over the rankings that contain d
  * (Cormack et al. 2009's k=60 form). RRF is the standard hybrid
  * scorer precisely because it needs NO score calibration between
  * systems — only ranks — which also makes it exactly replayable in
  * any engine: integer ranks in, fixed two-term double sum out.
  *
  * Scale shape: both inputs are top-k candidate lists (bounded — the
  * output of `bm25TopDocs` / an ANN probe, not corpus scans), so the
  * full-outer join and the final TakeOrdered are candidate-sized.
  * Absent ranks use a 0 sentinel (contributes nothing) to keep the
  * output schema integer-typed.
  */
object HybridRetrieval {

  def rrfFuse(
      lex: DataFrame,
      lexRankCol: String,
      vec: DataFrame,
      vecRankCol: String,
      idCol: String,
      rrfK: Int = 60,
      k: Int = 20): DataFrame = {
    require(rrfK > 0 && k > 0, s"need positive rrfK/k, got $rrfK/$k")
    val l = lex.select(col(idCol), col(lexRankCol).as("lex_rk"))
    val v = vec.select(col(idCol), col(vecRankCol).as("vec_rk"))
    l.join(v, Seq(idCol), "full_outer")
      .na.fill(0, Seq("lex_rk", "vec_rk"))
      .withColumn("rrf", round(
        when(col("lex_rk") > 0, lit(1.0) / (col("lex_rk") + rrfK)).otherwise(0.0) +
          when(col("vec_rk") > 0, lit(1.0) / (col("vec_rk") + rrfK)).otherwise(0.0), 6))
      .orderBy(desc("rrf"), col(idCol))
      .limit(k)
  }
}
