package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication"):
  * cluster the embedding space with KMeans, then look for near-duplicate
  * pairs only WITHIN each cluster, dropping all but the lowest-id member
  * of every near-dup neighborhood.
  *
  * Scale shape: the quadratic pair scan that kills brute-force semantic
  * dedup at 100 TB is scoped to single clusters — a self-equi-join on
  * the cell id (hash shuffle on cell, no cross join), so candidate pairs
  * are sum_c |c|^2 instead of n^2, tunable via nClusters exactly like
  * IVF probe cost. Reuses [[SimilaritySearch.buildIvfIndex]] (random-init
  * KMeans routing cells) — at petabyte scale the SAME index serves both
  * retrieval and dedup, which is why the clustering step is shared
  * infrastructure, not a dedup-private pass.
  *
  * Determinism: cosine scoring is exact; given a fixed clustering seed,
  * drops are deterministic. Cluster assignment itself is model state
  * (same caveat as every IVF query), so the contract query is
  * rows-only, pinned against the exhaustive
  * [[Dedup.embeddingNearDuplicates]] baseline in SemanticDedupSpec:
  * within-cluster pairs are a SUBSET of brute-force pairs (precision 1
  * by construction — scores are exact cosine, no sketch), recall is
  * governed by how often a near-dup pair straddles a cell boundary.
  */
object SemanticDedup {

  /** Within-cluster near-duplicate pairs (id_a < id_b, cos_sim >= tau). */
  def semanticDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      minCosine: Double,
      seed: Long = 42L): DataFrame = {
    val idx = SimilaritySearch.buildIvfIndex(df, idCol, vecCol, nlist = nClusters, seed = seed)
    val asg = idx.assigned // idCol, v (array<double>), cell
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val a = asg.select(col("cell"), col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = asg.select(col("cell"), col(idCol).as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    val pairs = a.join(b, "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        VectorOps.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cos_sim") >= minCosine)
      .select("id_a", "id_b", "cos_sim")
    // Release the build-time cache NOW, not at some caller-owned later
    // point: unpersisting a plan before any action simply drops the
    // cache entry — the returned lineage recomputes the (deterministic,
    // already-fitted) assignment when evaluated. One extra transform
    // scan per side beats an index-sized cache leak per dedup call;
    // callers doing repeated passes should buildIvfIndex once and join
    // idx.assigned directly, owning release() themselves.
    idx.release()
    pairs
  }

  /** Rows that survive semantic dedup: every document that has NO
    * lower-id within-cluster neighbor at cos_sim >= tau. Greedy
    * keep-lowest-id — the same keeper rule as the MinHash pipeline's
    * [[Components.dropNearDuplicates]], so the two scale paths are
    * interchangeable downstream.
    */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      minCosine: Double,
      seed: Long = 42L): DataFrame = {
    val drops = semanticDupPairs(df, idCol, vecCol, nClusters, minCosine, seed)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }
}
