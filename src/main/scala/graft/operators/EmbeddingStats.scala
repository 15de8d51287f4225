package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space GROUP STATISTICS — the diagnostics a
  * diversity-sampling or clustering pass reads before touching data:
  * per group (label, source, assigned cluster...), the centroid norm
  * and the DISPERSION (mean squared distance to the centroid). A
  * collapsed group (near-duplicate embeddings) shows dispersion ≈ 0; a
  * group whose embedding model drifted shows its centroid norm moving.
  * Dispersion uses the variance identity
  * E‖x−μ‖² = E‖x‖² − ‖μ‖² — two keyed aggregates, no pairwise
  * anything, exact.
  *
  * Scale shape: one row-local ‖x‖² aggregate per group, one
  * per-dimension mean (explode keyed by (group, dim) — dims are a
  * constant fan-out, so this is linear in vectors), one fold of μ_d²
  * per group. No collect, no crossJoin, no windows.
  */
object EmbeddingStats {

  def dispersion(
      df: DataFrame,
      vecCol: String,
      groupCol: String): DataFrame = {
    val v = df.select(
      col(groupCol).as("grp"),
      graft.functions.VectorOps.asDouble(col(vecCol)).as("__v"))
    val norms = v.groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        avg(graft.functions.VectorOps.dot(col("__v"), col("__v"))).as("__msq"))
    val mu = v
      .select(col("grp"), posexplode(col("__v")).as(Seq("dim", "x")))
      .groupBy(col("grp"), col("dim"))
      .agg(avg(col("x")).as("__mu"))
      .groupBy(col("grp"))
      .agg(sum(col("__mu") * col("__mu")).as("__c2"))
    norms.join(mu, Seq("grp"))
      .select(
        col("grp"),
        col("n"),
        round(sqrt(col("__c2")), 6).as("centroid_norm"),
        round(col("__msq") - col("__c2"), 6).as("dispersion"))
  }
}
