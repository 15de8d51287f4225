package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SemanticDedup, SimilaritySearch}

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  /** 60 well-spread base vectors + 8 planted near-duplicate copies
    * (tiny deterministic perturbation, cosine ~0.9999). Fixed RNG seed.
    */
  private lazy val fixture = {
    val rng = new scala.util.Random(7L)
    val base = (0L until 60L).map { i =>
      i -> Array.fill(16)(rng.nextGaussian().toFloat)
    }
    val dups = (0 until 8).map { j =>
      val (srcId, v) = base(j * 7)
      (100L + j, v.map(x => x * 1.0001f + 1e-4f), srcId)
    }
    val rows = base.map { case (i, v) => (i, v.toSeq) } ++
      dups.map { case (i, v, _) => (i, v.toSeq) }
    (rows.toDF("id", "v"), dups.map { case (i, _, src) => (src, i) })
  }

  test("within-cluster pairs are exact-cosine and a subset of brute force") {
    val (df, _) = fixture
    val sem = SemanticDedup.semanticDupPairs(df, "id", "v", nClusters = 4, minCosine = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Dedup.embeddingNearDuplicates(df, "id", "v", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(brute), s"false positives: ${sem -- brute}")
    // identical copies always share a cell, so recall on the planted
    // pairs is high; the bound leaves room for a rare boundary straddle
    assert(brute.nonEmpty)
    assert(sem.size.toDouble / brute.size >= 0.75,
      s"recall ${sem.size}/${brute.size}")
  }

  test("semanticDedup keeps the lowest id of each dup group, drops the copy") {
    val (df, planted) = fixture
    val kept = SemanticDedup.semanticDedup(df, "id", "v", nClusters = 4, minCosine = 0.99)
      .select("id").as[Long].collect().toSet
    // every source (lower id) survives
    planted.foreach { case (src, _) => assert(kept.contains(src), s"source $src dropped") }
    // dropped ids are exactly the id_b side of the pair set
    val drops = SemanticDedup.semanticDupPairs(df, "id", "v", nClusters = 4, minCosine = 0.99)
      .select("id_b").as[Long].collect().toSet
    assert(kept == df.select("id").as[Long].collect().toSet -- drops)
  }

  /** How semantic-dedup cells actually go hot at scale: the index was
    * built on yesterday's distribution (60 scattered vectors), then a
    * crawl batch concentrates into ONE blob that the routing sends to a
    * single existing cell. 180 blob members pair at cos ~0.7; 12
    * planted copies (1.0001 perturbation, cos >= 0.9999) are the only
    * pairs over minCosine = 0.999. Building KMeans fresh on the full
    * corpus would pre-split the blob — drift is the honest mechanism
    * (same rationale as SimilaritySpec's rebalance fixture).
    */
  private lazy val driftedFixture = {
    val rng = new scala.util.Random(19L)
    val dim = 16
    val scattered = (0L until 60L).map { i =>
      i -> Array.fill(dim)(rng.nextGaussian() * 4.0)
    }
    val blobCenter = Array.tabulate(dim)(i => if (i < 2) 9.0 else 0.0)
    val blob = (100L until 280L).map { i =>
      i -> blobCenter.map(c => c + rng.nextGaussian() * 0.9)
    }
    val dups = (0 until 12).map { j =>
      val (srcId, v) = blob(j * 11)
      (500L + j, v.map(x => x * 1.0001 + 1e-4), srcId)
    }
    val scatteredDf = scattered.map { case (i, v) => (i, v.toSeq) }.toDF("id", "v")
    val freshDf = (blob.map { case (i, v) => (i, v.toSeq) } ++
      dups.map { case (i, v, _) => (i, v.toSeq) }).toDF("id", "v")
    (scatteredDf, freshDf, dups.map { case (i, _, src) => (src, i) }.toSet)
  }

  test("hot cell from drift: rebalance bounds the self-join, pair set identical") {
    val (scatteredDf, freshDf, planted) = driftedFixture
    val idx0 = SimilaritySearch.buildIvfIndex(scatteredDf, "id", "v", nlist = 8, seed = 42L)
    val idx = SimilaritySearch.IvfIndex(
      idx0.centroids,
      idx0.assigned.union(
          SimilaritySearch.assignCells(freshDf, "id", "v", idx0.centroids))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val rawCells = idx.assigned.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mean = rawCells.values.sum.toDouble / idx.centroids.length
    assert(rawCells.values.max > 4.0 * mean,
      s"fixture must actually produce a hot cell (max ${rawCells.values.max}, mean $mean)")
    val rawPairs = SemanticDedup.semanticDupPairsOn(idx, "id", minCosine = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // The composition under test: rebalance THEN pair. The self-join's
    // candidate volume sum |c|^2 — the quantity that is O(hotCell^2) at
    // 100 TB — must collapse, and every true pair must survive the
    // split (near-identical vectors land in the same subcell).
    val reb = SimilaritySearch.rebalanceIvfIndex(idx, "id", hotFactor = 4.0, seed = 42L)
    val rebCells = reb.assigned.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rebPairs = SemanticDedup.semanticDupPairsOn(reb, "id", minCosine = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    reb.release()

    def pairVolume(cells: Map[Int, Long]): Long = cells.values.map(n => n * n).sum
    assert(rebCells.values.max <= rawCells.values.max / 2,
      s"hot cell must shrink substantially: ${rawCells.values.max} -> ${rebCells.values.max}")
    assert(pairVolume(rebCells) < pairVolume(rawCells) / 2,
      s"candidate pairs must collapse: ${pairVolume(rawCells)} -> ${pairVolume(rebCells)}")
    assert(rawPairs == planted,
      s"raw path: extra=${rawPairs.diff(planted)} missing=${planted.diff(rawPairs)}")
    assert(rebPairs == planted,
      s"rebalanced path: extra=${rebPairs.diff(planted)} missing=${planted.diff(rebPairs)}")
  }

  test("semanticDedup with rebalance keeps sources, drops planted copies") {
    val (scatteredDf, freshDf, planted) = driftedFixture
    val df = scatteredDf.union(freshDf)
    // Full-path smoke: the fresh KMeans build pre-splits the blob (so no
    // hot cell here — see driftedFixture doc), but the rebalance arm must
    // still find exactly the planted copies and keep every source.
    val kept = SemanticDedup.semanticDedup(df, "id", "v", nClusters = 8,
        minCosine = 0.999, rebalance = true)
      .select("id").as[Long].collect().toSet
    assert(kept == df.select("id").as[Long].collect().toSet -- planted.map(_._2))
  }

  test("no near-duplicates -> identity") {
    val (df, _) = fixture
    val base = df.filter(col("id") < 100)
    val kept = SemanticDedup.semanticDedup(base, "id", "v", nClusters = 4, minCosine = 0.999999)
      .count()
    assert(kept == 60)
  }

  test("adaptive thresholds compose with rebalance: subcells get their own taus") {
    val (scatteredDf, freshDf, planted) = driftedFixture
    // Drifted index: scattered-built centroids, blob appended -> one hot
    // cell (the hot-cell mechanism, same as the rebalance test).
    val idx0 = SimilaritySearch.buildIvfIndex(scatteredDf, "id", "v", nlist = 8, seed = 42L)
    val idx = SimilaritySearch.IvfIndex(
      idx0.centroids,
      idx0.assigned.union(
          SimilaritySearch.assignCells(freshDf, "id", "v", idx0.centroids))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val reb = SimilaritySearch.rebalanceIvfIndex(idx, "id", hotFactor = 4.0, seed = 42L)
    try {
      val tauFloor = 0.9
      val taus = SemanticDedup.adaptiveCellThresholds(reb, tauFloor, beta = 0.7)
        .collect().map(r => r.getAs[Int]("cell") -> r.getAs[Double]("tau_cell")).toMap
      // Every rebalanced cell (original + split subcells) carries a
      // threshold — the estimate runs off the assignment, so splits
      // need no special-casing.
      val cells = reb.assigned.select("cell").distinct().as[Int].collect().toSet
      assert(taus.keySet == cells)
      // Blob subcells are dense (members at cos ~0.97+ ambient): their
      // taus tighten above the floor; the scattered cells stay at it.
      assert(taus.values.exists(_ > tauFloor), s"no tightened subcell: $taus")
      assert(taus.values.exists(_ == tauFloor), s"no floor cell: $taus")
      // And the adaptive pair stage over the REBALANCED index still
      // catches every planted copy (cos >= 0.9999 beats any tau < 1).
      val pairs = SemanticDedup.semanticDupPairsOnAdaptive(reb, "id", tauFloor, beta = 0.7)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      planted.foreach(p => assert(pairs.contains(p), s"lost planted pair $p"))
    } finally { reb.release(); idx.release() }
  }

  /** Density-contrast fixture for the adaptive threshold: a DENSE blob
    * (40 distinct docs whose ambient cosine ~0.99 — one boilerplate
    * family, NOT duplicates) carrying 6 planted true dups (cos >=
    * 0.9999), plus a SPARSE region (40 scattered vectors, ambient
    * cosine ~0) carrying one planted borderline pair at exactly
    * cos = 0.985. A fixed tau = 0.98 over-merges the whole dense blob;
    * the adaptive threshold must keep the blob's distinct docs while
    * still catching both kinds of planted pair.
    */
  private lazy val densityFixture = {
    val rng = new scala.util.Random(23L)
    val dim = 16
    val center = Array.tabulate(dim)(i => if (i < 2) 9.0 else 0.0)
    val dense = (0L until 40L).map { i =>
      i -> center.map(c => c + rng.nextGaussian() * 0.3)
    }
    val denseDups = (0 until 6).map { j =>
      val (srcId, v) = dense(j * 6)
      (100L + j, v.map(x => x * 1.0001 + 1e-4), srcId)
    }
    val sparse = (200L until 240L).map { i =>
      i -> Array.fill(dim)(rng.nextGaussian() * 4.0)
    }
    // Borderline sparse pair at exactly cos = 0.985: mix v with a unit
    // vector orthogonalized against it (Gram-Schmidt from a fixed probe).
    val v = sparse.head._2
    val nv = math.sqrt(v.map(x => x * x).sum)
    val probe = Array.tabulate(dim)(i => if (i == dim - 1) 1.0 else 0.1)
    val proj = v.zip(probe).map { case (a, b) => a * b }.sum / (nv * nv)
    val orth = probe.zip(v).map { case (p, a) => p - proj * a }
    val no = math.sqrt(orth.map(x => x * x).sum)
    val cosT = 0.985
    val vPair = v.zip(orth).map { case (a, o) =>
      cosT * a + math.sqrt(1 - cosT * cosT) * (nv / no) * o }
    val rows = dense.map { case (i, w) => (i, w.toSeq) } ++
      denseDups.map { case (i, w, _) => (i, w.toSeq) } ++
      sparse.map { case (i, w) => (i, w.toSeq) } :+ (300L -> vPair.toSeq)
    (rows.toDF("id", "v"),
      denseDups.map { case (i, _, src) => (src min i, src max i) }.toSet,
      (200L, 300L))
  }

  test("adaptive epsilon: dense cells tighten, sparse cells keep the floor") {
    val (df, plantedDense, sparsePair) = densityFixture
    val tauFloor = 0.98
    val idx = SimilaritySearch.buildIvfIndex(df, "id", "v", nlist = 3, seed = 42L)
    try {
      val taus = SemanticDedup.adaptiveCellThresholds(idx, tauFloor, beta = 0.85)
        .collect().map(r => r.getAs[Int]("cell") ->
          (r.getAs[Double]("bg_sim"), r.getAs[Double]("tau_cell"))).toMap
      // Dense and sparse cells must get DIFFERENT effective thresholds:
      // at least one cell sits at the floor (sparse) and at least one is
      // strictly above it (the blob's ambient cosine pushes tau up).
      assert(taus.values.exists { case (_, t) => t == tauFloor },
        s"no cell at the floor: $taus")
      assert(taus.values.exists { case (bg, t) => t > 0.99 && bg > 0.97 },
        s"no tightened dense cell: $taus")

      val fixed = SemanticDedup.semanticDupPairsOn(idx, "id", tauFloor)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val adaptive = SemanticDedup.semanticDupPairsOnAdaptive(idx, "id", tauFloor, beta = 0.85)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // Precision pinned: adaptive pairs are exact-cosine and a subset of
      // BOTH the fixed pairs at the floor and brute force at the floor.
      val brute = Dedup.embeddingNearDuplicates(df, "id", "v", tauFloor)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(adaptive.subsetOf(fixed) && adaptive.subsetOf(brute))
      // The fixed threshold over-merges the dense blob (ambient ~0.99 >
      // 0.98: hundreds of distinct-doc pairs); adaptive keeps the blob.
      assert(fixed.size > 300, s"fixture not dense enough: ${fixed.size} fixed pairs")
      assert(adaptive.size < fixed.size / 10,
        s"adaptive kept ${adaptive.size} of ${fixed.size} fixed pairs")
      // ...while still catching every planted true dup in the dense cell
      plantedDense.foreach(p => assert(adaptive.contains(p), s"lost dense dup $p"))
      // ...and the sparse cell behaves exactly like the fixed floor:
      // the borderline 0.985 pair survives adaptation iff the floor saw it.
      assert(fixed.contains(sparsePair), "sparse pair straddled cells - retune fixture")
      assert(adaptive.contains(sparsePair), "adaptive lost the sparse borderline pair")

      // End-to-end: every planted copy is dropped (its source has the
      // lower id; the source itself may still fall to a lower-id ambient
      // neighbor that cleared the tightened tau — greedy keep-lowest-id).
      val kept = SemanticDedup.semanticDedupAdaptive(
          df, "id", "v", nClusters = 3, tauFloor = tauFloor, beta = 0.85, seed = 42L)
        .select("id").as[Long].collect().toSet
      plantedDense.foreach { case (_, dup) =>
        assert(!kept.contains(dup), s"planted copy $dup survived") }
      // Distinct dense-blob docs survive (fixed-threshold dedup would
      // collapse the blob to a handful of survivors).
      val denseSurvivors = kept.count(_ < 40L)
      assert(denseSurvivors > 30,
        s"dense blob over-merged: $denseSurvivors of 40 kept")
    } finally idx.release()
  }
}
