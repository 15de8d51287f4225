package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, same API:
  *  - brute-force cosine top-k: the exact baseline; one broadcast of the
  *    query vector, one scan, one TakeOrdered — at 100 TB this is the
  *    "score everything" pass and it parallelizes perfectly.
  *  - LSH-bucketed: random-hyperplane signatures partition vectors into
  *    2^numPlanes buckets; search touches only the query's bucket (plus
  *    optional hamming-1 probes). Candidate set shrinks ~2^planes-fold
  *    at the cost of recall — the standard ANN trade.
  */
object SimilaritySearch {

  /** Exact top-k by cosine against a literal query vector. `cos_sim` is
    * rounded to 6dp for cross-engine determinism; ties break on id.
    */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    val q = typedLit(query)
    // Float embeddings are consumed in place (type-aware dot kernel) —
    // no array<double> cast copy of the corpus.
    df.select(
        col(idCol),
        round(VectorOps.cosine(col(vecCol), q), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Two-stage coarse-to-fine search: a truncated-dimension scan
    * ([[graft.functions.VectorOps.truncate]] — a quarter of the vector
    * bytes at coarseDims = dims/4) selects `coarseK` candidates, then
    * exact full-dimension cosine re-ranks the survivors to `k`. The
    * standard matryoshka serving pattern: the expensive full-width read
    * touches only coarseK rows. Both stages are deterministic (rounded
    * scores, id tie-breaks), so the whole composition carries a value
    * oracle — unlike LSH/IVF coarse stages, which are model state.
    */
  def coarseToFineTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      coarseDims: Int,
      coarseK: Int): DataFrame = {
    require(coarseK >= k, s"coarseK ($coarseK) must be >= k ($k)")
    import graft.functions.VectorOps
    val cand = bruteForceTopK(
      df.withColumn("__t", VectorOps.truncate(col(vecCol), coarseDims)),
      idCol, "__t", query.take(coarseDims), coarseK)
      .select(col(idCol))
    bruteForceTopK(
      df.join(broadcast(cand), Seq(idCol), "left_semi"), idCol, vecCol, query, k)
  }

  /** Bucketed ANN: restrict scoring to vectors whose hyperplane signature
    * is within `maxProbeHamming` bits of the query's signature, then rank
    * those by exact cosine. multiProbe=0 searches only the exact bucket.
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      numPlanes: Int = 12,
      maxProbeHamming: Int = 1,
      seed: Long = 42L): DataFrame = {
    val dim = query.length
    val planes = VectorOps.randomPlanes(numPlanes, dim, seed)
    val qSig: Long = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x * y }.sum
      if (d >= 0) 1L << i else 0L
    }.foldLeft(0L)(_ | _)

    val qLit = typedLit(query)
    df.select(
        col(idCol),
        col(vecCol).as("v"),
        VectorOps.hyperplaneSignature(col(vecCol), planes).as("sig"))
      .filter(bit_count(col("sig").bitwiseXOR(lit(qSig))) <= maxProbeHamming)
      .select(col(idCol), round(VectorOps.cosine(col("v"), qLit), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** All signatures within `maxHamming` bit flips of `qSig` over
    * `numPlanes` bits — the multi-probe sequence. Size is
    * sum_{i<=h} C(numPlanes, i) (e.g. 137 for 16 planes, h=2): tiny,
    * generated on the driver, usable as an IN-list pruning predicate.
    */
  def probeSignatures(qSig: Long, numPlanes: Int, maxHamming: Int): Seq[Long] = {
    require(numPlanes >= 1 && numPlanes <= 63, s"numPlanes must be in [1,63], got $numPlanes")
    require(maxHamming >= 0 && maxHamming <= numPlanes,
      s"maxHamming must be in [0,numPlanes], got $maxHamming")
    // The ball size sum_{i<=h} C(numPlanes, i) grows combinatorially —
    // e.g. numPlanes=63, h=10 is already ~70B signatures, a driver OOM and
    // an unusable IN-list. Bound it up front; large radii belong to the
    // XOR-scan form (lshTopK), which filters in one pass at any radius.
    val ballSize = (0 to maxHamming).foldLeft(0L) { (acc, h) =>
      val c = (0 until h).foldLeft(1L)((n, i) =>
        math.min(n, 1L << 40) * (numPlanes - i) / (i + 1))
      math.min(acc + c, 1L << 40)
    }
    require(ballSize <= 8192,
      s"multi-probe ball has $ballSize signatures (> 8192): an IN-list this " +
        "size cannot prune anything — use lshTopK's XOR filter for large radii")
    (0 to maxHamming).flatMap(h =>
      (0 until numPlanes).combinations(h).map(bits =>
        bits.foldLeft(qSig)((s, b) => s ^ (1L << b))))
  }

  /** Multi-probe ANN: same results as [[lshTopK]] (bucket + every bucket
    * within `maxProbeHamming` bit flips) but expressed as an explicit
    * probe list — `sig IN (probes)` instead of a `bit_count(sig XOR q)`
    * scan predicate. The IN-list is what a signature-partitioned or
    * bucketed corpus can PRUNE on (partition/bucket/file skipping); the
    * XOR filter always touches every row. Recall is tuned by
    * `maxProbeHamming` alone — signatures are never rebuilt.
    */
  def lshTopKMultiProbe(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      numPlanes: Int = 12,
      maxProbeHamming: Int = 1,
      seed: Long = 42L): DataFrame = {
    val dim = query.length
    val planes = VectorOps.randomPlanes(numPlanes, dim, seed)
    val qSig: Long = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x * y }.sum
      if (d >= 0) 1L << i else 0L
    }.foldLeft(0L)(_ | _)
    val probes = probeSignatures(qSig, numPlanes, maxProbeHamming)

    val qLit = typedLit(query)
    df.select(
        col(idCol),
        col(vecCol).as("v"),
        VectorOps.hyperplaneSignature(col(vecCol), planes).as("sig"))
      .filter(col("sig").isin(probes: _*))
      .select(col(idCol), round(VectorOps.cosine(col("v"), qLit), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** 1-bit sign quantization + Hamming top-k: pack each vector's sign
    * bits into 64-bit words (8 bytes for a 64-dim corpus — 32x under
    * float32, the memory floor of the quantization family) and rank by
    * xor+popcount distance to the packed query. Deterministic with NO
    * model state — the bits are the data's own signs — so unlike
    * IVF/SQ8/PQ the contract query (`q_sim_binary`) carries a full
    * DuckDB oracle. Ties break id-ascending; the plan is one
    * codegen'd scan + TakeOrderedAndProject. At rest, persist
    * `signPack(vec)` next to ids and the probe reads 8 bytes/vector.
    */
  def binarySignTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Double],
      k: Int): DataFrame = {
    val qWords = packSignsDriver(query)
    corpus.select(
        col(idCol),
        graft.plans.HashExpressions.hammingTo(
          graft.plans.HashExpressions.signPack(VectorOps.asDouble(col(vecCol))),
          qWords).as("hamming"))
      .orderBy(asc("hamming"), col(idCol))
      .limit(k)
  }

  /** Hamming shortlist + exact-dot re-rank on original vectors — the
    * same coarse-to-fine composition as the PQ/SQ8 arms, with the
    * cheapest possible coarse pass.
    */
  def binarySignTopKReranked(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Double],
      k: Int,
      shortlist: Int = 4): DataFrame = {
    val cand = binarySignTopK(corpus, idCol, vecCol, query, k * shortlist)
      .select(col(idCol))
    val qLit = typedLit(query.toSeq)
    corpus.join(broadcast(cand), Seq(idCol), "left_semi")
      .select(col(idCol),
        round(VectorOps.dot(VectorOps.asDouble(col(vecCol)), qLit), 6).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Batch form: ONE corpus scan serves every query — corpus packs
    * once per row, the (tiny) packed query set broadcasts, pairwise
    * xor+popcount scores the cross join, and the per-query top-k is a
    * rank window partitioned by query id (shuffles only candidate
    * rows). Same full-oracle determinism as [[binarySignTopK]].
    */
  def binarySignTopKBatch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val packed = corpus.select(
      col(idCol),
      graft.plans.HashExpressions.signPack(VectorOps.asDouble(col(vecCol))).as("__cw"))
    val qs = broadcast(queries.select(
      col(idCol).as("qid"),
      graft.plans.HashExpressions.signPack(VectorOps.asDouble(col(vecCol))).as("__qw")))
    val w = Window.partitionBy("qid").orderBy(asc("hamming"), col(idCol))
    packed.join(qs, col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        graft.plans.HashExpressions.hammingPair(col("__cw"), col("__qw")).as("hamming"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Persist packed sign words — the 1-bit codes-at-rest form: the
    * stored table is (id, words) at ~8 bytes/vector payload, and a
    * probe scans ONLY it (no floats, no re-pack). The id column name
    * travels in a sidecar like the IVF/PQ stores; deletion lifecycle
    * would mirror [[deleteFromIvfIndex]]'s tombstones (the store is a
    * plain parquet dir — the PQ staging/tombstone machinery drops in
    * unchanged; kept minimal here because packing is so cheap that
    * rebuild-on-change is usually the right call at this code size).
    */
  /** @param carryCols metadata columns stored beside the sign words —
    *                   same attribute co-location as
    *                   [[buildIvfIndex]]'s carryCols, enabling
    *                   [[binaryTopKStoredWhere]] to filter inside the
    *                   stored probe.
    */
  def saveBinaryIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      carryCols: Seq[String] = Nil): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq(idCol).toDF("id_col").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .json(s"$path/idcol")
    corpus
      .select((Seq(col(idCol),
        graft.plans.HashExpressions.signPack(VectorOps.asDouble(col(vecCol))).as("words")) ++
        carryCols.map(col)): _*)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/words")
  }

  /** Hamming probe over a persisted sign store — identical ranking to
    * [[binarySignTopK]] over the original vectors (packing is
    * deterministic; pinned in SimilaritySpec).
    */
  def binaryTopKStored(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      query: Array[Double],
      k: Int): DataFrame =
    binaryTopKStoredWhere(spark, path, query, k, lit(true))

  /** Attribute-filtered Hamming probe of a sign store written with
    * carryCols: the predicate lands BEFORE the ranking, pushed to the
    * store's parquet scan by Catalyst — a slice probe reads less, never
    * post-filters (mirrors [[ivfTopKWhere]] for the IVF store).
    */
  def binaryTopKStoredWhere(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      query: Array[Double],
      k: Int,
      pred: org.apache.spark.sql.Column): DataFrame = {
    val idCol = spark.read.json(s"$path/idcol").select("id_col").head().getString(0)
    val qWords = packSignsDriver(query)
    loadBinaryWords(spark, path)
      .filter(pred)
      .select(col(idCol),
        graft.plans.HashExpressions.hammingTo(col("words"), qWords).as("hamming"))
      .orderBy(asc("hamming"), col(idCol))
      .limit(k)
  }

  /** The stored sign words with tombstones filtered (broadcast
    * anti-join, keyed on the id column by NAME from the sidecar) —
    * same lifecycle contract as the IVF and PQ stores.
    */
  def loadBinaryWords(
      spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val idCol = spark.read.json(s"$path/idcol").select("id_col").head().getString(0)
    val words = spark.read.parquet(s"$path/words")
    val tp = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tp)) {
      val ts = spark.read.parquet(tp.toString).distinct()
      words.join(broadcast(ts), words(idCol) === ts("__del_id"), "left_anti")
    } else words
  }

  /** Tombstone deletion for a persisted sign store — metadata-only,
    * O(deletions); probes via [[binaryTopKStored]]/
    * [[binaryTopKStoredWhere]] exclude deleted ids at load. Batch form:
    * ids flow in as DATA (a one-column DataFrame), never plan text.
    */
  def deleteFromBinaryIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ids: DataFrame): Unit = {
    ids.select(col(ids.columns.head).as("__del_id")).distinct()
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/_tombstones")
  }

  def deleteFromBinaryIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ids: Seq[Long]): Unit = {
    if (ids.nonEmpty) {
      import spark.implicits._
      deleteFromBinaryIndex(spark, path, ids.toDF("__del_id"))
    }
  }

  /** Fold tombstones into the sign store: rewrite words without the
    * deleted rows, drop the tombstone file. O(index) — amortize over
    * many deletions, like the IVF/PQ vacuums.
    */
  def vacuumBinaryIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val clean = loadBinaryWords(spark, path).localCheckpoint(true)
    clean.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/words")
    val tp = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    tp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(tp, true)
    ()
  }

  private def packSignsDriver(v: Array[Double]): Seq[Long] = {
    val words = new Array[Long]((v.length + 63) >>> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    words.toSeq
  }

  /** IVF (inverted-file) index: KMeans partitions the corpus into `nlist`
    * Voronoi cells; queries score only the `nprobe` nearest cells. The
    * assignment DataFrame is the "index" — at scale you persist/bucket it
    * by cell so a probe touches nlist/nprobe of the data. Centroids are
    * tiny (nlist x dim) and live on the driver for query routing.
    */
  final case class IvfIndex(
      centroids: Array[Array[Double]],
      assigned: DataFrame /* idCol, cell, vector as array<double> */) {

    /** Release the index's cached assignment. [[buildIvfIndex]] and
      * [[rebalanceIvfIndex]] persist `assigned` (every probe re-reads
      * it; without the persist each query re-runs the clustering scan),
      * and Spark caches are not GC'd with the object — a long-running
      * session that builds indexes in a loop would otherwise accrete
      * index-sized cached plans. Call when the index is retired; no-op
      * for indexes whose assignment is an external table
      * ([[loadIvfIndex]]).
      */
    def release(): Unit = { assigned.unpersist(); () }
  }

  /** @param carryCols metadata columns to co-locate with the index rows
    *                   (source, license, lang, label, ...) — the
    *                   prerequisite for attribute-FILTERED search
    *                   ([[ivfTopKWhere]]): a predicate can only prune
    *                   inside the probe if its columns live beside the
    *                   codes, not in a table a probe would have to join.
    */
  def buildIvfIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      seed: Long = 42L,
      maxIter: Int = 8,
      carryCols: Seq[String] = Nil): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val prepared = df.select(
      (Seq(col(idCol), col(vecCol).as("v"),
        array_to_vector(col(vecCol)).as("features")) ++ carryCols.map(col)): _*)
    // Routing cells don't need converged clustering: random init (one
    // pass) + few Lloyd iterations gives the same recall-per-probe as
    // k-means|| at a fraction of the fit jobs; recall is governed by
    // nprobe, and the nprobe=nlist=brute-force identity is init-agnostic.
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
      .setInitMode("random").setMaxIter(maxIter).fit(prepared)
    val assigned = model.transform(prepared)
      .select((Seq(col(idCol), col("v"), col("prediction").as("cell")) ++
        carryCols.map(col)): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    IvfIndex(model.clusterCenters.map(_.toArray), assigned)
  }

  /** A PCA-reduced IVF index (r13, the distributed-PCA follow-through):
    * the eigenbasis routes and shortlists in `components` dimensions
    * while the FULL vectors ride the assignment as a carry column for
    * exact re-ranking. At 100 TB the win is the candidate scan: cells
    * cluster and probe over `components`-sized vectors (d -> k bytes
    * per row in the hot loop) and the d-dimensional read touches only
    * the shortlist — the matryoshka/coarse-to-fine pattern with a
    * LEARNED basis instead of truncation, composed from the same
    * moment fold the covariance/PCA queries verify.
    */
  final case class PcaIvfIndex(pca: EmbeddingStats.PcaModel, ivf: IvfIndex) {
    def release(): Unit = ivf.release()
  }

  /** Fit PCA(components) on the corpus (one moment-fold pass), project
    * every vector through the codegen'd affine mat-vec, and build the
    * IVF routing index in the REDUCED space with the full vector
    * carried beside each assignment for the re-rank stage.
    */
  def buildPcaIvfIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      components: Int = 16,
      nlist: Int = 16,
      seed: Long = 42L,
      maxIter: Int = 8): PcaIvfIndex = {
    val model = EmbeddingStats.pca(df, vecCol, components)
    val prepared = EmbeddingStats.pcaProject(df, vecCol, model, "__proj")
      .select(col(idCol), col("__proj"),
        VectorOps.asDouble(col(vecCol)).as("__full"))
    val ivf = buildIvfIndex(prepared, idCol, "__proj",
      nlist = nlist, seed = seed, maxIter = maxIter, carryCols = Seq("__full"))
    PcaIvfIndex(model, ivf)
  }

  /** Persist a PCA->IVF index: the eigenbasis as a tiny JSON sidecar
    * (k×d + 2 vectors — model metadata, like the PQ codebook sidecar)
    * plus the reduced-space IVF store via [[saveIvfIndex]] (bucketed,
    * cell-sorted, carrying the full vectors). Probes of the loaded
    * index inherit every IVF-store property — bucket pruning on cell,
    * tombstones, shuffle-free batch joins — and are bit-identical to
    * the in-session index (spec-pinned).
    */
  def savePcaIvfIndex(
      index: PcaIvfIndex,
      idCol: String,
      tableName: String,
      path: String,
      buckets: Int = 16): Unit = {
    val spark = index.ivf.assigned.sparkSession
    import spark.implicits._
    Seq((index.pca.mean.toSeq, index.pca.axes.flatten.toSeq,
        index.pca.explained.toSeq, index.pca.k, index.pca.d))
      .toDF("mean", "axes_flat", "explained", "k", "d")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .json(s"$path/pca")
    saveIvfIndex(index.ivf, idCol, tableName, s"$path/ivf", buckets)
  }

  /** Load a persisted PCA->IVF index — no clustering, no moment pass;
    * drop-in for [[pcaIvfTopK]].
    */
  def loadPcaIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      path: String): PcaIvfIndex = {
    val r = spark.read.json(s"$path/pca")
      .select(col("mean").cast("array<double>"),
        col("axes_flat").cast("array<double>"),
        col("explained").cast("array<double>"),
        col("k").cast("int"), col("d").cast("int"))
      .head()
    val (mean, flat, explained, k, d) =
      (r.getSeq[Double](0).toArray, r.getSeq[Double](1).toArray,
        r.getSeq[Double](2).toArray, r.getInt(3), r.getInt(4))
    require(flat.length == k * d, s"axes sidecar ${flat.length} != $k x $d")
    val model = EmbeddingStats.PcaModel(
      mean, Array.tabulate(k)(i => flat.slice(i * d, (i + 1) * d)), explained)
    PcaIvfIndex(model, loadIvfIndex(spark, tableName, s"$path/ivf"))
  }

  /** y = A(q − μ), driver-side — queries are single vectors. */
  private def pcaProjectQuery(
      m: EmbeddingStats.PcaModel, q: Seq[Double]): Seq[Double] = {
    require(q.length == m.d, s"query dim ${q.length} != model dim ${m.d}")
    m.axes.toSeq.map { a =>
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i) * (q(i) - m.mean(i)); i += 1 }
      s
    }
  }

  /** Coarse-to-fine ANN through the PCA-reduced index: project the
    * query into the eigenbasis, IVF-probe `nprobe` cells in reduced
    * space for a `k * shortlist` candidate set, then re-rank the
    * candidates by EXACT full-dimension cosine (the carried vectors —
    * no second corpus scan). With nprobe = nlist and a shortlist
    * covering the corpus this is exactly brute-force top-k regardless
    * of the eigenbasis or cells (the q_sim_pq_exhaustive identity);
    * realistic settings trade recall for probing `components/d` of the
    * bytes, floor-pinned in SimilaritySpec.
    */
  def pcaIvfTopK(
      index: PcaIvfIndex,
      idCol: String,
      query: Seq[Double],
      k: Int,
      nprobe: Int = 4,
      shortlist: Int = 4): DataFrame = {
    require(shortlist >= 1, s"shortlist factor must be >= 1, got $shortlist")
    val qp = pcaProjectQuery(index.pca, query)
    val cand = ivfTopK(index.ivf, idCol, qp, k * shortlist, nprobe)
      .select(col(idCol))
    val qLit = typedLit(query)
    index.ivf.assigned
      .join(broadcast(cand), Seq(idCol), "left_semi")
      .select(col(idCol),
        round(VectorOps.cosine(col("__full"), qLit), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Persist an IVF index: centroids as a tiny JSON-lines table (nlist
    * rows — readable by anything), the cell assignment as a bucketed,
    * cell-sorted external table via [[graft.sources.TableIO.writeBucketed]].
    *
    * This is what makes the index durable AT SCALE: a probe against the
    * loaded table prunes buckets on `cell IN (...)` (file skipping, no
    * scan of unprobed cells) and the batch path's equi-join on `cell`
    * reads the corpus side with ZERO shuffle exchange — re-clustering or
    * re-shuffling 100 TB per session is exactly what this avoids.
    * Asserted at plan level in SimilaritySpec.
    */
  def saveIvfIndex(
      index: IvfIndex,
      idCol: String,
      tableName: String,
      path: String,
      buckets: Int = 16): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cvec")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .json(s"$path/centroids")
    // Persist the id column NAME next to the centroids: the tombstone
    // anti-join at load must key on the id by name, not by ordinal —
    // a store written with a different column order would otherwise
    // silently stop filtering deletions.
    Seq(idCol).toDF("id_col").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .json(s"$path/idcol")
    // Persist EVERY assignment column — id/vector/cell plus any
    // carryCols metadata the index was built with: filtered search
    // ([[ivfTopKWhere]]) must survive the persist/load round-trip, and
    // a loaded index without its attributes silently could not filter.
    // The known trio leads so stores predating the idcol sidecar keep
    // their first-column id contract.
    val carry = index.assigned.columns
      .filterNot(Set(idCol, "v", "cell")).map(col).toSeq
    graft.sources.TableIO.writeBucketed(
      index.assigned.select((Seq(col(idCol), col("v"), col("cell")) ++ carry): _*),
      tableName, s"$path/assigned", buckets, Seq("cell"))
  }

  /** Load a persisted IVF index: centroids to the driver (nlist x dim —
    * tiny), the assignment as the bucketed table. The returned index is
    * drop-in for [[ivfTopK]]/[[ivfTopKBatch]]; no clustering runs.
    * Tombstoned ids ([[deleteFromIvfIndex]]) are filtered out here with
    * a broadcast anti-join, so every probe of a loaded index honors
    * prior deletions without any index rewrite.
    */
  def loadIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      path: String): IvfIndex = {
    val cents = spark.read.json(s"$path/centroids")
      .select(col("cell").cast("int"), col("cvec").cast("array<double>"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val table = spark.table(tableName)
    val assigned = tombstones(spark, path) match {
      case Some(ts) =>
        table.join(broadcast(ts), table(idColOf(spark, path, table)) === ts("__del_id"), "left_anti")
      case None => table
    }
    IvfIndex(cents, assigned)
  }

  /** Delete vectors from a persisted IVF index by TOMBSTONE, not
    * rewrite: the bucketed assignment table stays byte-identical (its
    * cell-sorted, bucket-pruned layout is the index's value), and
    * deleted ids land in a tiny `_tombstones` parquet that
    * [[loadIvfIndex]] anti-joins (broadcast — deletion sets are small
    * by nature) at load time. Idempotent: re-deleting an id appends a
    * duplicate tombstone, which the anti-join ignores. When tombstones
    * grow past a few percent of the corpus, rebuild with
    * [[saveIvfIndex]] from the filtered assignment — the tombstone file
    * is removed by that rewrite.
    */
  def deleteFromIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ids: Seq[Long]): Unit = {
    if (ids.nonEmpty) {
      import spark.implicits._
      deleteFromIvfIndex(spark, path, ids.toDF("__del_id"))
    }
  }

  /** Batch form: `ids` is a one-column DataFrame — deletion batches
    * flow in as data, never as driver plan text (mirrors
    * [[graft.operators.TrainingData.deleteFromShards]]'s batch form).
    */
  def deleteFromIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ids: org.apache.spark.sql.DataFrame): Unit = {
    ids.select(col(ids.columns.head).as("__del_id")).distinct()
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/_tombstones")
  }

  /** Fold accumulated tombstones into the store: rewrite the bucketed
    * assignment without the deleted rows and remove the tombstone file.
    * [[deleteFromIvfIndex]] is O(deletions) per call and every probe
    * pays one (broadcast) anti-join; vacuum is the O(index) compaction
    * you amortize over many deletions — run it when tombstones reach a
    * few percent of the corpus. The kept rows are local-checkpointed
    * before the overwrite because they are read from the very table
    * being rewritten.
    */
  def vacuumIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      idCol: String,
      tableName: String,
      path: String,
      buckets: Int = 16): Unit = {
    val idx = loadIvfIndex(spark, tableName, path) // tombstones filtered here
    val clean = idx.assigned.localCheckpoint(true)
    saveIvfIndex(IvfIndex(idx.centroids, clean), idCol, tableName, path, buckets)
    val p = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** Resolve the assignment table's id column by NAME from the `idcol`
    * sidecar [[saveIvfIndex]] writes; stores that predate the sidecar
    * (e.g. the streaming-assign path) fall back to the first column,
    * which was the only contract before.
    */
  private def idColOf(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      table: org.apache.spark.sql.DataFrame): String = {
    val p = new org.apache.hadoop.fs.Path(s"$path/idcol")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.json(p.toString).select("id_col").head().getString(0)
    else table.columns.head
  }

  private def tombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[org.apache.spark.sql.DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Split hot Voronoi cells so no probe has to scan an outsized one.
    *
    * Skewed corpora (one dominant language, boilerplate-heavy crawls)
    * concentrate mass in a few cells; a probe routed there scans
    * `count(hotCell)` vectors instead of ~`N/nlist`, and at 100 TB that
    * single cell is the straggler task. Rebalance re-KMeans each cell
    * whose row count exceeds `hotFactor` x the corpus mean into
    * ~`count/mean` subcells (capped at `maxSplit`), reusing the hot
    * cell's id for the first subcell and appending the rest, so COLD
    * cells keep their ids, their centroids, and their rows untouched —
    * an incremental index (bucketed table, streamed appends) only
    * rewrites the hot cells' rows.
    *
    * The returned index honors the same contract as [[buildIvfIndex]]
    * (centroids positionally indexed by cell id; assigned = (id, v,
    * cell)), so [[saveIvfIndex]]/[[loadIvfIndex]]/[[ivfTopK]]/
    * [[ivfTopKBatch]]/[[assignCells]] are all drop-in. Driver state
    * stays bounded: the cell histogram is nlist rows and each fit scans
    * only its own cell (bucket-pruned when assigned is a bucketed
    * table). Recall semantics are unchanged — nprobe = nlist is still
    * exactly brute force, and per-probe recall is governed by nprobe as
    * before (asserted in SimilaritySpec).
    */
  def rebalanceIvfIndex(
      index: IvfIndex,
      idCol: String,
      hotFactor: Double = 4.0,
      maxSplit: Int = 32,
      seed: Long = 42L,
      maxIter: Int = 8): IvfIndex = {
    require(hotFactor > 1.0, s"hotFactor must exceed 1 (got $hotFactor)")
    require(maxSplit >= 2, s"maxSplit must be at least 2 (got $maxSplit)")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // Cell histogram: nlist rows — driver-bounded, like the centroids.
    val counts = index.assigned.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mean = counts.values.sum.toDouble / index.centroids.length
    val hot = counts.filter { case (_, n) => n > hotFactor * mean }.keys.toSeq.sorted
    if (hot.isEmpty) return index

    // Materialize the hot rows ONCE: every per-cell KMeans fit (maxIter
    // passes each) and transform below reads this bounded cached slice.
    // Without it, a loaded (uncached) index pays ~(hot_cells + 2) full
    // corpus scans for what is a hot-cells-sized working set.
    val hotRows = index.assigned
      .filter(col("cell").isin(hot.map(Integer.valueOf): _*))
      .select(col(idCol), col("v"), col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val grown = scala.collection.mutable.ArrayBuffer[Array[Double]](index.centroids: _*)
    val pieces = hot.map { cell =>
      // Aim each subcell at the corpus mean: a 27x-mean cell splits ~27
      // ways (capped), not in half — one rebalance pass reaches balance.
      val m = math.min(math.min(maxSplit.toLong, counts(cell)),
        math.max(2L, math.ceil(counts(cell) / mean).toLong)).toInt
      val prepared = hotRows.filter(col("cell") === cell)
        .withColumn("features", array_to_vector(col("v")))
      // Same init rationale as buildIvfIndex: routing cells don't need
      // converged clustering, and recall stays governed by nprobe.
      val model = new KMeans().setK(m).setSeed(seed + cell).setFeaturesCol("features")
        .setInitMode("random").setMaxIter(maxIter).fit(prepared)
      val sub = model.clusterCenters.map(_.toArray)
      val ids = sub.indices.map { i =>
        if (i == 0) { grown(cell) = sub(0); cell }
        else { grown += sub(i); grown.length - 1 }
      }
      val idMap = typedLit(ids.indices.map(i => i -> ids(i)).toMap)
      model.transform(prepared)
        .select(col(idCol), col("v"), element_at(idMap, col("prediction")).as("cell"))
    }
    val cold = index.assigned
      .filter(!col("cell").isin(hot.map(Integer.valueOf): _*))
      .select(col(idCol), col("v"), col("cell"))
    val assigned = pieces.foldLeft(cold)(_ union _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize the rebalanced assignment, then drop the builder-local
    // hot slice and the superseded input cache: the caller holds the NEW
    // index; keeping the old one's cache alive would double the
    // index-sized memory footprint for the session's lifetime. (The old
    // IvfIndex value stays usable — its assignment just recomputes if
    // probed again.)
    assigned.count()
    hotRows.unpersist()
    index.release()
    IvfIndex(grown.toArray, assigned)
  }

  /** Assign each row to its nearest centroid cell — the routing half of
    * IVF without any clustering: exact argmin over the (tiny, broadcast)
    * centroid table via the same dot-identity distance as
    * [[ivfTopKBatch]]. Output schema matches `IvfIndex.assigned`
    * (id, v in its ORIGINAL vector type, cell), so the result appends
    * into a persisted index layout unchanged.
    */
  def assignCells(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cvec")
      .withColumn("cn2", VectorOps.dot(col("cvec"), col("cvec")))
    val w = Window.partitionBy(idCol).orderBy(col("d2"), col("cell"))
    df.select(col(idCol), col(vecCol).as("v"))
      .withColumn("qd", VectorOps.asDouble(col("v")))
      .withColumn("qn2", VectorOps.dot(col("qd"), col("qd")))
      .crossJoin(broadcast(cents))
      .withColumn("d2", col("qn2") + col("cn2") - lit(2.0) * VectorOps.dot(col("qd"), col("cvec")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col("v"), col("cell"))
  }

  /** Append pre-assigned rows into a persisted index table, preserving
    * the bucketed-by-cell layout (the bucket spec must match the one the
    * table was created with — Spark validates on append). This is what
    * keeps probes prune-correct as the corpus grows.
    */
  def appendToIvfIndex(assigned: DataFrame, tableName: String, buckets: Int): Unit =
    assigned.write.format("parquet").mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(buckets, "cell").sortBy("cell")
      .saveAsTable(tableName)

  /** Idempotent per-batch append for [[streamingIvfAssign]]: foreachBatch
    * is at-least-once (a batch whose sink write succeeded but whose
    * checkpoint commit did not is REPLAYED on restart), and a blind
    * parquet append would then duplicate index rows — ivfTopK could
    * return the same id twice within k. A batch-id marker file, written
    * only AFTER the append succeeds, makes the replay a no-op.
    *
    * Residual window: a crash between the append and the marker write
    * still duplicates that one batch — exactly-once needs a transactional
    * table format (Delta — absent in this offline environment, SURVEY
    * §1.4). Callers needing exactness under that window should dedup on
    * `idCol` at probe time.
    */
  def appendIvfBatchIdempotent(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      tableName: String,
      buckets: Int,
      checkpoint: String,
      batchId: Long): Unit = {
    val hconf = batch.sparkSession.sessionState.newHadoopConf()
    val marker = new org.apache.hadoop.fs.Path(s"$checkpoint/graft-batch-commits/$batchId")
    val fs = marker.getFileSystem(hconf)
    if (!fs.exists(marker)) {
      appendToIvfIndex(assignCells(batch, idCol, vecCol, centroids), tableName, buckets)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
    }
  }

  /** Continuous ingest into a persisted IVF index: each micro-batch is
    * routed onto the EXISTING centroids (no re-clustering — cells only
    * drift when the index is rebuilt, the standard IVF operating mode)
    * and appended bucket-aligned via foreachBatch, guarded against
    * restart replays by [[appendIvfBatchIdempotent]]'s batch-id markers
    * (kept under the query's own checkpoint directory, so index and
    * marker lifecycle travel together). The streaming half of
    * [[saveIvfIndex]]/[[loadIvfIndex]].
    */
  def streamingIvfAssign(
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      tableName: String,
      buckets: Int,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        appendIvfBatchIdempotent(batch, idCol, vecCol, centroids, tableName, buckets, checkpoint, batchId)
      }
      .start()

  /** ANN top-k through an IVF index: route the query to its `nprobe`
    * nearest centroids (driver-side — centroids are tiny), scan only
    * those cells, rank by exact cosine. Recall improves with nprobe at
    * linear cost; nprobe = nlist degenerates to brute force.
    */
  def ivfTopK(
      index: IvfIndex,
      idCol: String,
      query: Seq[Double],
      k: Int,
      nprobe: Int = 4): DataFrame = {
    def dist2(c: Array[Double]): Double =
      c.zip(query).map { case (x, y) => (x - y) * (x - y) }.sum
    val cells = index.centroids.zipWithIndex
      .sortBy { case (c, _) => dist2(c) }
      .take(nprobe).map(_._2)
    val qLit = typedLit(query)
    index.assigned
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col(idCol), round(VectorOps.cosine(col("v"), qLit), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Attribute-FILTERED ANN through the IVF index — top-k among rows
    * satisfying `pred` (over `carryCols` the index was built with, plus
    * id/cell). The standard production vector-search requirement:
    * "nearest neighbors within this source/license/language slice".
    *
    * The predicate prunes INSIDE the probe — between the cell filter and
    * the scoring projection — so a narrow slice costs LESS than an
    * unfiltered probe, never a post-filter of its results. Returned rows
    * all satisfy `pred` exactly; like every IVF probe, RECALL against the
    * filtered brute-force answer is governed by `nprobe` — and filtered
    * search typically wants it WIDER than unfiltered (a selective
    * predicate thins each probed cell's candidate pool; nprobe = nlist
    * recovers exact filtered brute force, the SimilaritySpec identity).
    */
  def ivfTopKWhere(
      index: IvfIndex,
      idCol: String,
      query: Seq[Double],
      pred: org.apache.spark.sql.Column,
      k: Int,
      nprobe: Int = 8): DataFrame = {
    def dist2(c: Array[Double]): Double =
      c.zip(query).map { case (x, y) => (x - y) * (x - y) }.sum
    val cells = index.centroids.zipWithIndex
      .sortBy { case (c, _) => dist2(c) }
      .take(nprobe).map(_._2)
    val qLit = typedLit(query)
    index.assigned
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .filter(pred)
      .select(col(idCol), round(VectorOps.cosine(col("v"), qLit), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** [[ivfTopKWhere]] with AUTO-WIDENING nprobe: a selective predicate
    * thins each probed cell's candidate pool, and a fixed nprobe that
    * is ample unfiltered can under-fill the filtered top-k (fewer than
    * k matches probed, or a k-th result far below the filtered-brute
    * answer) with no signal to the caller. This variant widens the
    * probe until the pool of PREDICATE-SATISFYING candidates reaches
    * `minPoolFactor * k` (or every cell is probed), then ranks.
    *
    * Cost shape: widening rounds count only the NEWLY-added cells
    * (nprobe, then doubling), so the probed region is scanned at most
    * twice — once counting, once ranking — and the unprobed remainder
    * is never touched. On a predicate dense in the nearest cells the
    * first count already clears the bar and the overhead is one
    * counting pass over nprobe cells. nprobe = nlist from the start
    * degenerates to exact filtered brute force, as ever.
    */
  def ivfTopKWhereWiden(
      index: IvfIndex,
      idCol: String,
      query: Seq[Double],
      pred: org.apache.spark.sql.Column,
      k: Int,
      nprobe: Int = 8,
      minPoolFactor: Int = 4): DataFrame = {
    require(minPoolFactor >= 1, s"minPoolFactor must be >= 1, got $minPoolFactor")
    def dist2(c: Array[Double]): Double =
      c.zip(query).map { case (x, y) => (x - y) * (x - y) }.sum
    val order = index.centroids.zipWithIndex
      .sortBy { case (c, _) => dist2(c) }.map(_._2)
    val nlist = order.length
    val target = minPoolFactor.toLong * k
    var probed = 0
    var pool = 0L
    var width = math.min(math.max(1, nprobe), nlist)
    while (pool < target && probed < nlist) {
      val newCells = order.slice(probed, width)
      pool += index.assigned
        .filter(col("cell").isin(newCells.map(Integer.valueOf).toSeq: _*))
        .filter(pred)
        .count()
      probed = width
      width = math.min(width * 2, nlist)
    }
    ivfTopKWhere(index, idCol, query, pred, k, nprobe = probed)
  }

  /** [[ivfTopKBatchWhere]] with PER-QUERY auto-widening — the batch
    * analogue of [[ivfTopKWhereWiden]], and a strictly better widening
    * rule because a batch can afford exact knowledge: ONE counting
    * pass over the predicate slice (`slice.groupBy(cell).count()`,
    * nlist rows out) is amortized over every query, so each query
    * keeps the MINIMAL prefix of its distance-ranked cells whose
    * cumulative slice count reaches `minPoolFactor * k` (never below
    * the `nprobe` floor), instead of the single-query form's blind
    * doubling (which exists precisely to avoid a full-slice counting
    * scan for one query). Fully declarative — the per-query prefix is
    * a running-sum window over queries x nlist routing rows, no driver
    * loop — and each query's probed set is a superset of the fixed
    * nprobe set, so its returned scores dominate
    * [[ivfTopKBatchWhere]]'s pointwise.
    */
  def ivfTopKBatchWhereWiden(
      index: IvfIndex,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      pred: org.apache.spark.sql.Column,
      k: Int,
      nprobe: Int = 8,
      minPoolFactor: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    require(minPoolFactor >= 1, s"minPoolFactor must be >= 1, got $minPoolFactor")
    import org.apache.spark.sql.expressions.Window
    val spark = queries.sparkSession
    import spark.implicits._
    val idName = index.assigned.columns.head
    val slice = index.assigned.filter(pred)
    val counts = slice.groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
    val cents = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cvec")
      .withColumn("cn2", VectorOps.dot(col("cvec"), col("cvec")))
    val q = queries.select(col(qIdCol).as("qid"), VectorOps.asDouble(col(qVecCol)).as("qv"))
      .withColumn("qn", VectorOps.l2Norm(col("qv")))
    val wRoute = Window.partitionBy("qid").orderBy(col("d2"), col("cell"))
    val routed = q.crossJoin(broadcast(cents))
      .withColumn("d2",
        col("qn") * col("qn") + col("cn2") - lit(2.0) * VectorOps.dot(col("qv"), col("cvec")))
      .withColumn("rn", row_number().over(wRoute))
      .join(broadcast(counts), Seq("cell"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      // Slice rows in cells ranked strictly before this one; the cell
      // is probed while that running pool is still short of the target.
      .withColumn("pool_before", coalesce(
        sum(col("cnt")).over(wRoute.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("rn") <= nprobe ||
        col("pool_before") < lit(minPoolFactor.toLong * k))
      .select(col("qid"), col("qv"), col("qn"), col("cell"))
    val corpus = slice
      .select(col(idName).as("id"), col("v"), col("cell"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val wRank = Window.partitionBy("qid").orderBy(desc("cos_sim"), col("id"))
    val joined = routed.join(corpus, "cell")
    val candidates = if (excludeSelf) joined.filter(col("qid") =!= col("id")) else joined
    candidates
      .withColumn("cos_sim",
        round(VectorOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select("qid", "id", "cos_sim", "rank")
  }

  /** Attribute-filtered BATCH ANN: [[ivfTopKBatch]] restricted to
    * corpus rows satisfying `pred` (over carryCols the index was built
    * with) — completes the filtered-search matrix: single-query
    * ([[ivfTopKWhere]]), id-set ([[ivfTopKBatchAmong]]), and
    * attribute-predicate batch. The predicate narrows the corpus side
    * BEFORE the cell equi-join, so out-of-slice rows never join, score,
    * or rank; at nprobe = nlist each query's rows are exactly its
    * filtered brute-force top-k (the SimilaritySpec identity).
    */
  def ivfTopKBatchWhere(
      index: IvfIndex,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      pred: org.apache.spark.sql.Column,
      k: Int,
      nprobe: Int = 8,
      excludeSelf: Boolean = true): DataFrame =
    ivfTopKBatch(
      IvfIndex(index.centroids, index.assigned.filter(pred)),
      queries, qIdCol, qVecCol, k, nprobe, excludeSelf)

  /** Subset-restricted batch ANN: results limited to corpus ids present
    * in `allowed` (one-column DataFrame, any name) — the id-set form of
    * filtered search, for when the slice is an upstream computation
    * (dedup survivors, a decontamination pass) rather than a stored
    * attribute. The restriction is a semi-join on the candidate set
    * BEFORE ranking (broadcast when small), so correctness never depends
    * on the slice being an index attribute.
    */
  def ivfTopKBatchAmong(
      index: IvfIndex,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      allowed: DataFrame,
      k: Int,
      nprobe: Int = 8,
      excludeSelf: Boolean = true): DataFrame = {
    val idName = index.assigned.columns.head
    val allow = allowed.select(
      col(allowed.columns.head)
        .cast(index.assigned.schema(idName).dataType).as("__allow_id"))
      .distinct()
    val restricted = IvfIndex(
      index.centroids,
      index.assigned.join(
        broadcast(allow),
        index.assigned(idName) === col("__allow_id"), "left_semi"))
    ivfTopKBatch(restricted, queries, qIdCol, qVecCol, k, nprobe, excludeSelf)
  }

  /** Batch ANN through the IVF index: a whole DataFrame of queries is
    * routed in one plan — queries x centroids (centroids broadcast;
    * nlist rows each) -> keep each query's nprobe nearest cells ->
    * equi-join with the cell-partitioned corpus -> exact cosine -> rank.
    * Shuffle volume: each query replicated nprobe ways, each corpus
    * vector touched only for probed cells. This is the scale API — one
    * driver-side vector per call ([[ivfTopK]]) cannot amortize the scan.
    */
  /** @param excludeSelf drop candidate rows whose corpus id equals the
    *                     query id — right for self-search (queries drawn
    *                     from the corpus, the identity match is noise);
    *                     set false when querying a foreign corpus where
    *                     ids may coincide by accident.
    */
  def ivfTopKBatch(
      index: IvfIndex,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      nprobe: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cvec")
      .withColumn("cn2", VectorOps.dot(col("cvec"), col("cvec")))

    val q = queries.select(col(qIdCol).as("qid"), VectorOps.asDouble(col(qVecCol)).as("qv"))
      .withColumn("qn", VectorOps.l2Norm(col("qv")))

    // Squared euclidean distance to each centroid via dot identities —
    // no per-pair norm recomputation.
    val wRoute = Window.partitionBy("qid").orderBy(col("d2"), col("cell"))
    val routed = q.crossJoin(broadcast(cents))
      .withColumn("d2",
        col("qn") * col("qn") + col("cn2") - lit(2.0) * VectorOps.dot(col("qv"), col("cvec")))
      .withColumn("rn", row_number().over(wRoute))
      .filter(col("rn") <= nprobe)
      .select("qid", "qv", "qn", "cell")

    val corpus = index.assigned
      .select(col(index.assigned.columns.head).as("id"), col("v"), col("cell"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))

    val wRank = Window.partitionBy("qid").orderBy(desc("cos_sim"), col("id"))
    val joined = routed.join(corpus, "cell")
    val candidates = if (excludeSelf) joined.filter(col("qid") =!= col("id")) else joined
    candidates
      .withColumn("cos_sim",
        round(VectorOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select("qid", "id", "cos_sim", "rank")
  }

  /** All-pairs exact top-k join (each left row to its k nearest right
    * rows) — building block for kNN-graph construction. Brute force with
    * a rank window; LSH-bucket before calling at scale.
    */
  /** LSH-bucketed kNN join — the scale path for [[knnJoin]]: candidates
    * are pairs whose hyperplane signatures agree on at least one
    * (maxHamming+1)-way chunk (pigeonhole guarantees every pair within
    * maxHamming signature bits), scored exactly, ranked per left row.
    * Recall is probabilistic (a true neighbor can differ in more bits);
    * rows with fewer than k candidates return what was found. Cost:
    * sum of per-bucket |L_b| x |R_b| instead of |L| x |R|.
    */
  def knnJoinLSH(
      left: DataFrame,
      right: DataFrame,
      idColL: String,
      idColR: String,
      vecColL: String,
      vecColR: String,
      k: Int,
      numPlanes: Int = 16,
      maxHamming: Int = 2,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // With fewer planes than chunks, the trailing chunks would hash every
    // row to 0 and the join silently degenerates to a cross join (correct
    // but brute-force cost) — fail loudly instead.
    require(numPlanes >= maxHamming + 1,
      s"knnJoinLSH needs numPlanes >= maxHamming + 1 (got numPlanes=$numPlanes, maxHamming=$maxHamming)")
    val dim = left.select(size(col(vecColL))).head().getInt(0)
    val planes = VectorOps.randomPlanes(numPlanes, dim, seed)
    val chunks = maxHamming + 1
    val bitsPer = (numPlanes + chunks - 1) / chunks
    def chunkCols(sig: Column): Column = array((0 until chunks).map { c =>
      val start = c * bitsPer
      val width = math.max(1, math.min(bitsPer, numPlanes - start))
      struct(
        lit(c).as("chunk"),
        shiftrightunsigned(sig, start).bitwiseAND(lit((1L << width) - 1)).as("cv"))
    }: _*)

    def prep(df: DataFrame, idCol: String, vecCol: String, side: String): DataFrame =
      df.select(col(idCol).as(s"id_$side"), col(vecCol).as(s"v_$side"))
        .withColumn(s"n_$side", VectorOps.l2Norm(col(s"v_$side")))
        .withColumn("ch", explode(chunkCols(
          VectorOps.hyperplaneSignature(col(s"v_$side"), planes))))
        .select(col(s"id_$side"), col(s"v_$side"), col(s"n_$side"),
          col("ch.chunk").as("chunk"), col("ch.cv").as("cv"))

    // Self-join (kNN-graph construction): alias ONE prepared plan on both
    // sides so the shuffle exchanges canonicalize identically and
    // ReuseExchange computes signatures + chunk explode once, not twice —
    // at scale that is one corpus scan saved per graph build.
    val selfJoin = (left eq right) && idColL == idColR && vecColL == vecColR
    val collided =
      if (selfJoin) {
        val p = prep(left, idColL, vecColL, "l")
        p.as("a").join(p.as("b"),
            col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv"))
          .select(
            col("a.id_l").as("id_l"), col("a.v_l").as("v_l"), col("a.n_l").as("n_l"),
            col("b.id_l").as("id_r"), col("b.v_l").as("v_r"), col("b.n_l").as("n_r"))
      } else {
        prep(left, idColL, vecColL, "l").join(prep(right, idColR, vecColR, "r"), Seq("chunk", "cv"))
      }

    val w = Window.partitionBy("id_l").orderBy(desc("cos_sim"), col("id_r"))
    // Score at the collision, THEN dedup on the scalar triple — a pair
    // colliding in multiple chunks costs an extra dot product but the
    // dedup shuffle carries no vectors.
    collided
      .filter(col("id_l") =!= col("id_r"))
      .withColumn("cos_sim",
        round(VectorOps.dot(col("v_l"), col("v_r")) / (col("n_l") * col("n_r")), 6))
      .select("id_l", "id_r", "cos_sim")
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id_l", "id_r", "cos_sim", "rank")
  }

  def knnJoin(
      left: DataFrame,
      right: DataFrame,
      idColL: String,
      idColR: String,
      vecColL: String,
      vecColR: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Norms precomputed per ROW, not per pair: cosine-as-one-expression
    // would run three dot products per candidate (the two norms redone
    // |L|x|R| times) — measured 3x slower on a 4M-pair join.
    val l = left.select(col(idColL).as("id_l"), col(vecColL).as("v_l"))
      .withColumn("n_l", VectorOps.l2Norm(col("v_l")))
    val r = right.select(col(idColR).as("id_r"), col(vecColR).as("v_r"))
      .withColumn("n_r", VectorOps.l2Norm(col("v_r")))
    val scored = l.crossJoin(r)
      .filter(col("id_l") =!= col("id_r"))
      .withColumn("cos_sim",
        round(VectorOps.dot(col("v_l"), col("v_r")) / (col("n_l") * col("n_r")), 6))
    val w = Window.partitionBy("id_l").orderBy(desc("cos_sim"), col("id_r"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id_l", "id_r", "cos_sim", "rank")
  }

  /** Contrastive-pair mining for retrieval/embedding training: per
    * ANCHOR, the positives (cos ≥ `posMin` — near-duplicates / same-
    * item evidence) and the top-k HARD negatives — the most similar
    * candidates inside the (negMin, negMax) band, which is where the
    * training signal lives (random negatives are too easy, ≥ negMax
    * risks false negatives; the banded pick is the standard DPR/SBERT
    * recipe). Candidates above negMax but below posMin fall in the
    * "ambiguous" gap and are deliberately dropped from BOTH roles.
    *
    * Scale shape: the anchor set is a curated training seed (bounded —
    * the [[graft.operators.TrainingData.semanticContamination]]
    * broadcast argument), so scoring is one row-local corpus pass with
    * per-row norms; role assignment is a filter; the per-(anchor,
    * role) top-k is a window over the band-filtered slice. Exact and
    * fully oracle-replayable (positives unbounded by design — they
    * are typically few; negatives capped at k).
    */
  def hardNegatives(
      candidates: DataFrame,
      anchors: DataFrame,
      idCol: String,
      vecCol: String,
      anchorIdCol: String,
      anchorVecCol: String,
      k: Int,
      posMin: Double = 0.95,
      negMin: Double = 0.5,
      negMax: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(negMin < negMax && negMax <= posMin,
      s"need negMin < negMax <= posMin, got $negMin/$negMax/$posMin")
    // Zero vectors have no cosine direction: filter them explicitly
    // (matching the other entry points' convention) instead of letting
    // a NaN cos_sim silently fail every band filter.
    val a = anchors.select(col(anchorIdCol).as("anchor_id"),
        col(anchorVecCol).as("v_a"))
      .withColumn("n_a", VectorOps.l2Norm(col("v_a")))
      .filter(col("n_a") > 0)
    val c = candidates.select(col(idCol).as("vec_id"), col(vecCol).as("v_c"))
      .withColumn("n_c", VectorOps.l2Norm(col("v_c")))
      .filter(col("n_c") > 0)
    val scored = c.crossJoin(broadcast(a))
      .filter(col("vec_id") =!= col("anchor_id"))
      .withColumn("cos_sim",
        round(VectorOps.dot(col("v_a"), col("v_c")) / (col("n_a") * col("n_c")), 6))
    val pos = scored.filter(col("cos_sim") >= posMin)
      .select(col("anchor_id"), col("vec_id"), col("cos_sim"),
        lit("positive").as("role"))
    val w = Window.partitionBy("anchor_id").orderBy(desc("cos_sim"), col("vec_id"))
    val neg = scored
      .filter(col("cos_sim") >= negMin && col("cos_sim") < negMax)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("anchor_id"), col("vec_id"), col("cos_sim"),
        lit("hard_negative").as("role"))
    pos.unionByName(neg)
  }

  /** [[hardNegatives]] routed through an IVF index — the corpus-scale
    * anchor path (r16): when the anchor set is itself corpus-sized (the
    * contrastive-mining norm, every training query an anchor), the
    * brute `crossJoin(broadcast(anchors))` stops being an option; here
    * each anchor routes to its `nprobe` nearest cells and scores only
    * those cells' rows, so cost is corpus·nprobe/nlist per anchor
    * batch, with anchors SHUFFLED to cells rather than broadcast.
    * Positives (cos ≥ posMin) sit nearest the anchor, so small nprobe
    * recovers them; the hard-negative band lives further out — raise
    * nprobe toward nlist to trade cost for band recall. At
    * nprobe = nlist every cell is probed and the output is EXACTLY the
    * brute [[hardNegatives]] on the same corpus (the established IVF
    * identity; partial-probe band recall floor pinned alongside it in
    * SimilaritySpec).
    */
  def hardNegativesIvf(
      index: IvfIndex,
      anchors: DataFrame,
      anchorIdCol: String,
      anchorVecCol: String,
      k: Int,
      posMin: Double = 0.95,
      negMin: Double = 0.5,
      negMax: Double = 0.9,
      nprobe: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(negMin < negMax && negMax <= posMin,
      s"need negMin < negMax <= posMin, got $negMin/$negMax/$posMin")
    val spark = anchors.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cvec")
      .withColumn("cn2", VectorOps.dot(col("cvec"), col("cvec")))
    val a = anchors.select(col(anchorIdCol).as("anchor_id"),
        VectorOps.asDouble(col(anchorVecCol)).as("qv"))
      .withColumn("qn", VectorOps.l2Norm(col("qv")))
      .filter(col("qn") > 0)
    val wRoute = Window.partitionBy("anchor_id").orderBy(col("d2"), col("cell"))
    val routed = a.crossJoin(broadcast(cents))
      .withColumn("d2",
        col("qn") * col("qn") + col("cn2") - lit(2.0) * VectorOps.dot(col("qv"), col("cvec")))
      .withColumn("rn", row_number().over(wRoute))
      .filter(col("rn") <= nprobe)
      .select("anchor_id", "qv", "qn", "cell")
    val corpus = index.assigned
      .select(col(index.assigned.columns.head).as("vec_id"), col("v"), col("cell"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
      .filter(col("nrm") > 0)
    val scored = routed.join(corpus, "cell")
      .filter(col("vec_id") =!= col("anchor_id"))
      .withColumn("cos_sim",
        round(VectorOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
    val pos = scored.filter(col("cos_sim") >= posMin)
      .select(col("anchor_id"), col("vec_id"), col("cos_sim"),
        lit("positive").as("role"))
    val wRank = Window.partitionBy("anchor_id").orderBy(desc("cos_sim"), col("vec_id"))
    val neg = scored
      .filter(col("cos_sim") >= negMin && col("cos_sim") < negMax)
      .withColumn("__rk", row_number().over(wRank))
      .filter(col("__rk") <= k)
      .select(col("anchor_id"), col("vec_id"), col("cos_sim"),
        lit("hard_negative").as("role"))
    pos.unionByName(neg)
  }
}
