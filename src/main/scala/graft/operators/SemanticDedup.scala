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
      minCosine: Double): DataFrame =
    scoredCellPairs(idx, idCol)
      .filter(col("cos_sim") >= minCosine)
      .select("id_a", "id_b", "cos_sim")

  /** All within-cell pairs with exact cosine (cell, id_a < id_b,
    * cos_sim) — the shared candidate stage the fixed and adaptive
    * thresholds both filter.
    */
  private def scoredCellPairs(
      idx: SimilaritySearch.IvfIndex,
      idCol: String): DataFrame = {
    val asg = idx.assigned // idCol, v (array<double>), cell
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val a = asg.select(col("cell"), col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = asg.select(col("cell"), col(idCol).as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        VectorOps.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
  }

  /** Per-cell ADAPTIVE thresholds from cell density: one fixed epsilon
    * over/under-merges when cells differ wildly in concentration — in
    * a tight cell (one boilerplate family, one language) EVERYTHING
    * sits above a global tau and fixed-epsilon dedup collapses
    * distinct documents; in a diffuse cell the same tau is fine.
    *
    * Density is estimated WITHOUT pairs (the whole point — a per-cell
    * quantile of actual pair similarities would re-run the quadratic
    * stage this operator exists to avoid): `bg_sim` = median over the
    * cell's rows of cos(u, mu)  — u the row's unit vector, mu the
    * cell's mean unit vector — SQUARED, because for two rows at small
    * angles a, b from the cell mean, their pairwise cosine
    * concentrates around cos(a)cos(b) ~ median^2. The MEDIAN (not the
    * mean-vector norm) makes the estimate robust to cell
    * contamination: a minority of stray scattered members pulls
    * ||mean(u)|| down quadratically but cannot move the median row at
    * all. Cost: posexplode -> per-(cell, dim) avg for mu (nlist x dim
    * groups), broadcast mu back, one percentile_approx pass — two
    * linear scans of the assignment, zero pairs.
    *
    * The threshold interpolates from the floor toward 1 as background
    * similarity rises: tau_cell = max(tauFloor, bg + beta * (1 - bg))
    * — a dup must beat the cell's AMBIENT similarity by a margin, not
    * just a corpus-global constant. beta = 0 degenerates to the fixed
    * threshold; beta -> 1 demands near-identity in dense cells.
    * Returns (cell, bg_sim, tau_cell) — nlist rows, broadcastable.
    */
  def adaptiveCellThresholds(
      idx: SimilaritySearch.IvfIndex,
      tauFloor: Double,
      beta: Double): DataFrame = {
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    val asg = idx.assigned
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
      .filter(col("nrm") > 0) // zero vectors have no cosine; they pair with nothing
      .withColumn("u", transform(col("v"), x => x / col("nrm")))
    val mu = asg.select(col("cell"), posexplode(col("u")).as(Seq("dim", "x")))
      .groupBy("cell", "dim").agg(avg(col("x")).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("mu"))
    asg.join(broadcast(mu), "cell")
      .withColumn("cos_mu",
        VectorOps.dot(col("u"), col("mu")) / VectorOps.l2Norm(col("mu")))
      .groupBy("cell")
      .agg(percentile_approx(col("cos_mu"), lit(0.5), lit(10000)).as("med"))
      .select(
        col("cell"),
        (greatest(lit(0.0), col("med")) * greatest(lit(0.0), col("med"))).as("bg_sim"))
      .select(
        col("cell"),
        col("bg_sim"),
        greatest(lit(tauFloor),
          col("bg_sim") + lit(beta) * (lit(1.0) - col("bg_sim"))).as("tau_cell"))
  }

  /** [[semanticDupPairsOn]] with the per-cell adaptive threshold:
    * pairs must clear their OWN cell's tau_cell (>= tauFloor always,
    * so adaptive pairs are a SUBSET of the fixed-threshold pairs at
    * tauFloor — precision vs brute force stays 1 by construction; what
    * adapts is how much of a dense cell's ambient similarity gets
    * mistaken for duplication). Thresholds are nlist rows, broadcast.
    */
  def semanticDupPairsOnAdaptive(
      idx: SimilaritySearch.IvfIndex,
      idCol: String,
      tauFloor: Double,
      beta: Double): DataFrame = {
    val taus = adaptiveCellThresholds(idx, tauFloor, beta)
    scoredCellPairs(idx, idCol)
      .join(broadcast(taus), "cell")
      .filter(col("cos_sim") >= col("tau_cell"))
      .select("id_a", "id_b", "cos_sim")
  }

  /** [[semanticDedup]] with the adaptive per-cell threshold: drop the
    * higher id of every within-cell pair clearing its cell's tau.
    */
  def semanticDedupAdaptive(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      tauFloor: Double,
      beta: Double = 0.5,
      seed: Long = 42L,
      rebalance: Boolean = false,
      hotFactor: Double = 4.0,
      maxSplit: Int = 32): DataFrame = {
    val built = SimilaritySearch.buildIvfIndex(df, idCol, vecCol, nlist = nClusters, seed = seed)
    val idx =
      if (rebalance)
        SimilaritySearch.rebalanceIvfIndex(built, idCol, hotFactor, maxSplit, seed)
      else built
    val drops = semanticDupPairsOnAdaptive(idx, idCol, tauFloor, beta)
      .select(col("id_b").as(idCol)).distinct()
    idx.release()
    df.join(drops, Seq(idCol), "left_anti")
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
