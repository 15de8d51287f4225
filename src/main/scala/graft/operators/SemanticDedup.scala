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

  /** Within-cluster near-duplicate pairs (id_a < id_b, cos_sim >= tau).
    *
    * `rebalance` routes the index build through
    * [[SimilaritySearch.rebalanceIvfIndex]] before the cell self-join.
    * Natural corpora cluster Zipfian — one dominant language or
    * boilerplate family can put most of the mass in ONE KMeans cell,
    * and the self-join there is O(hotCell²) pairs: at 100 TB that
    * single cell is the job. Splitting cells over `hotFactor` x the
    * mean into ~count/mean subcells caps every cell near the mean, so
    * candidate pairs stay ~n²/nlist no matter how skewed the corpus.
    * Near-identical vectors land in the same SUBcell (they are within
    * quantization distance of each other), so true near-dup pairs
    * survive the split — pinned on a planted hot cluster in
    * SemanticDedupSpec; recall for borderline pairs remains governed by
    * cell granularity exactly as without rebalance.
    */
  def semanticDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      minCosine: Double,
      seed: Long = 42L,
      rebalance: Boolean = false,
      hotFactor: Double = 4.0,
      maxSplit: Int = 32): DataFrame = {
    val built = SimilaritySearch.buildIvfIndex(df, idCol, vecCol, nlist = nClusters, seed = seed)
    // rebalanceIvfIndex releases the superseded input cache itself and
    // returns an index honoring the same contract, so the tail of this
    // method is identical on both paths.
    val idx =
      if (rebalance)
        SimilaritySearch.rebalanceIvfIndex(built, idCol, hotFactor, maxSplit, seed)
      else built
    val pairs = semanticDupPairsOn(idx, idCol, minCosine)
    // Release the build-time cache NOW, not at some caller-owned later
    // point: unpersisting a plan before any action simply drops the
    // cache entry — the returned lineage recomputes the (deterministic,
    // already-fitted) assignment when evaluated. One extra transform
    // scan per side beats an index-sized cache leak per dedup call;
    // callers doing repeated passes should buildIvfIndex once and use
    // [[semanticDupPairsOn]] directly, owning release() themselves.
    idx.release()
    pairs
  }

  /** The pairing stage over an EXISTING index — the repeated-pass /
    * shared-infrastructure entry point ([[SimilaritySearch.loadIvfIndex]]
    * stores, incremental corpora, or an index already routed through
    * [[SimilaritySearch.rebalanceIvfIndex]]). Drifted indexes are where
    * hot cells actually come from at scale: appends routed into cells
    * built on yesterday's distribution concentrate in a few of them, and
    * rebalance-then-pair caps the self-join (SemanticDedupSpec). Caller
    * owns the index lifecycle.
    */
  def semanticDupPairsOn(
      idx: SimilaritySearch.IvfIndex,
      idCol: String,
      minCosine: Double): DataFrame = {
    val asg = idx.assigned // idCol, v (array<double>), cell
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val a = asg.select(col("cell"), col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = asg.select(col("cell"), col(idCol).as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        VectorOps.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cos_sim") >= minCosine)
      .select("id_a", "id_b", "cos_sim")
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
      seed: Long = 42L,
      rebalance: Boolean = false,
      hotFactor: Double = 4.0,
      maxSplit: Int = 32): DataFrame = {
    val drops = semanticDupPairs(
        df, idCol, vecCol, nClusters, minCosine, seed, rebalance, hotFactor, maxSplit)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }
}
