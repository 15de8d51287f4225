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

  /** One distributed pass collecting the moment statistics PCA and the
    * covariance need: (n, Σx, Σxxᵀ). mapPartitions folds into three
    * local accumulators (d + d² doubles), reduce merges partition
    * results — counters cross the wire, never vectors (the OPQ
    * Procrustes scatter-fold shape).
    */
  private def moments(df: DataFrame, vecCol: String): (Long, Array[Double], Array[Double]) = {
    val rdd = df
      .select(graft.functions.VectorOps.asDouble(col(vecCol)).as("__v"))
      .na.drop("any")
      .rdd.map(_.getSeq[Double](0))
    rdd.mapPartitions { it =>
      var n = 0L
      var s: Array[Double] = null
      var ss: Array[Double] = null
      it.foreach { v =>
        val d = v.length
        if (s == null) { s = new Array[Double](d); ss = new Array[Double](d * d) }
        require(d * d == ss.length, s"ragged embedding dims: $d vs ${s.length}")
        n += 1
        var i = 0
        while (i < d) {
          val xi = v(i)
          s(i) += xi
          val base = i * d
          var j = 0
          while (j < d) { ss(base + j) += xi * v(j); j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty else Iterator.single((n, s, ss))
    }.reduce { (a, b) =>
      require(a._2.length == b._2.length, "ragged embedding dims across partitions")
      var i = 0
      while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
      i = 0
      while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
      (a._1 + b._1, a._2, a._3)
    }
  }

  /** Population covariance matrix of the embedding column as a
    * (i, j, cov) frame, i <= j (symmetric): cov = Σxxᵀ/n − μμᵀ. The
    * corpus pass is the [[moments]] fold; the d²-sized result
    * materializes driver-side (metadata, like a centroid table). The
    * SQL oracle replays avg(x_i·x_j) − avg(x_i)·avg(x_j) per pair.
    */
  def covariance(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (n, s, ss) = moments(df, vecCol)
    val d = s.length
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield (i, j, ss(i * d + j) / n - (s(i) / n) * (s(j) / n))
    rows.toDF("i", "j", "cov")
  }

  /** Engine-portable covariance: same statistic as [[covariance]], but
    * every moment is an EXACT decimal sum so the result is bit-identical
    * regardless of partition count, fold order, or which engine replays
    * it. The [[moments]] double fold is partition-order-dependent in its
    * last ulp — fine as PCA input (the eigenbasis is rows-only anyway),
    * but a ulp landing at a round(…, 6) boundary flips the 6th decimal
    * between runs (observed: the r13 `q_emb_covariance` hash fail).
    * Here instead: each component is quantized onto the 6dp grid
    * (round, then an exact decimal(18,6) cast), all d² cross products
    * and d sums accumulate as decimals (order-free, associative), each
    * aggregate casts to double ONCE, and cov = Sxy/n − (Sx/n)(Sy/n)
    * runs in one fixed scalar-IEEE parenthesization — the q_acf
    * discipline applied to a matrix.
    *
    * Scale shape: the pair fan-out (d² structs per row) feeds a hash
    * aggregate directly, so map-side partial aggregation collapses each
    * partition to ≤ d(d+1)/2 counter rows before the one tiny shuffle —
    * no self-join, no d²·n rows on the wire. Per-dimension sums ride
    * the diagonal pairs (i = j share Sx_i), joined back over the
    * metadata-sized (d×d) result.
    */
  def covarianceExact(df: DataFrame, vecCol: String): DataFrame = {
    val q = transform(
      graft.functions.VectorOps.asDouble(col(vecCol)),
      x => round(x, 6).cast("decimal(18,6)"))
    val pairs = df
      .select(q.as("__q"))
      .na.drop("any")
      .select(posexplode(col("__q")).as(Seq("i", "x")), col("__q"))
      .select(col("i"), col("x"),
        posexplode(col("__q")).as(Seq("j", "y")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("x")).cast("double").as("__sx"),
        sum(col("y")).cast("double").as("__sy"),
        sum(col("x") * col("y")).cast("double").as("__sxy"))
    pairs.select(col("i"), col("j"),
      (col("__sxy") / col("__n")
        - (col("__sx") / col("__n")) * (col("__sy") / col("__n"))).as("cov"))
  }

  /** A fitted PCA basis: per-dimension mean, k orthonormal axes (rows,
    * descending eigenvalue), and the explained variance per axis.
    */
  case class PcaModel(
      mean: Array[Double],
      axes: Array[Array[Double]],
      explained: Array[Double]) {
    def k: Int = axes.length
    def d: Int = mean.length
  }

  /** Distributed PCA of the embedding column: ONE corpus pass (the
    * [[moments]] fold — counters to the driver, never vectors), then a
    * driver-side symmetric eigendecomposition of the d×d covariance
    * (breeze/LAPACK dsyev — d is embedding-sized, trivially
    * driver-shaped; the corpus never reshuffles). Axes are
    * sign-canonicalized (largest-|component| entry positive, first
    * index on ties) so the basis is deterministic despite LAPACK's
    * eigenvector sign freedom. The eigen state itself is
    * engine-internal — PCA queries are rows-only with spec pinning
    * (orthonormality, descending explained variance, variance
    * capture), like the KMeans families.
    */
  def pca(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k >= 1, s"component count must be >= 1, got $k")
    val (n, s, ss) = moments(df, vecCol)
    val d = s.length
    require(k <= d, s"k=$k exceeds embedding dim $d")
    val cov = breeze.linalg.DenseMatrix.tabulate(d, d) { (i, j) =>
      ss(i * d + j) / n - (s(i) / n) * (s(j) / n)
    }
    val es = breeze.linalg.eigSym(cov)
    // eigSym returns eigenvalues ascending; take the top k, largest first.
    val order = (d - 1) to (d - k) by -1
    val axes = order.map { c =>
      val v = Array.tabulate(d)(r => es.eigenvectors(r, c))
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    val explained = order.map(es.eigenvalues(_)).toArray
    PcaModel(s.map(_ / n), axes, explained)
  }

  /** Project the embedding column onto a fitted basis: y = A(x − μ) as
    * one codegen'd affine mat-vec per row (A·μ folded into a constant
    * offset) — row-local, zero shuffle, the cheap front half of
    * dimensionality-reduced dedup/retrieval.
    */
  def pcaProject(df: DataFrame, vecCol: String, model: PcaModel, outCol: String): DataFrame = {
    val flat = model.axes.flatten.toSeq
    val offset = model.axes.map(a =>
      a.zip(model.mean).map { case (w, m) => w * m }.sum).toSeq
    df.withColumn(outCol,
      graft.plans.HashExpressions.matVecAffine(
        graft.functions.VectorOps.asDouble(col(vecCol)),
        flat, offset, model.k, model.d))
  }

  /** PCA WHITENING: y = Λ^(−1/2) · A(x − μ) — the projection with each
    * axis rescaled to unit variance. Whitened space makes euclidean
    * distance Mahalanobis-equivalent, which is what embedding-cosine
    * dedup and k-means cells actually want when the raw space has
    * anisotropic scale (one dominant direction otherwise owns every
    * distance). Same codegen'd affine mat-vec — the 1/√λ scale folds
    * into the matrix and offset driver-side, so whitening costs exactly
    * a projection. Axes with λ ≤ `eps` are dropped to zero scale
    * (degenerate directions would otherwise amplify float noise
    * unboundedly). Covariance-of-whitened ≈ I is spec-pinned.
    */
  def pcaWhiten(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      outCol: String,
      eps: Double = 1e-12): DataFrame = {
    val scales = model.explained.map(v => if (v > eps) 1.0 / math.sqrt(v) else 0.0)
    val flat = model.axes.zip(scales).flatMap { case (a, s) => a.map(_ * s) }.toSeq
    val offset = model.axes.zip(scales).map { case (a, s) =>
      a.zip(model.mean).map { case (w, m) => w * m }.sum * s
    }.toSeq
    df.withColumn(outCol,
      graft.plans.HashExpressions.matVecAffine(
        graft.functions.VectorOps.asDouble(col(vecCol)),
        flat, offset, model.k, model.d))
  }

  /** MAHALANOBIS anomaly score: D²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ) — the
    * covariance-aware outlier distance (the multivariate upgrade of the
    * per-column robust-z/IQR gates): a point far along a
    * high-variance direction is NORMAL, the same euclidean distance
    * across a tight direction is an anomaly. Computed as ‖whiten(x)‖²
    * over the full-rank PCA basis (Σ⁻¹ = Aᵀ Λ⁻¹ A), so the corpus pass
    * is one moments fold + one codegen'd mat-vec scan — row-local,
    * zero shuffle, and invariant under any invertible linear transform
    * of the features (spec-pinned by scaling one dimension 100× and
    * getting identical scores). Degenerate directions (λ ≤ eps) are
    * excluded from the distance, matching the pseudo-inverse
    * convention. For gaussian data D² ~ χ²(d): mean ≈ d, which the
    * spec pins as a sanity band.
    */
  def mahalanobisScore(
      df: DataFrame,
      vecCol: String,
      outCol: String,
      eps: Double = 1e-12): DataFrame = {
    val probe = df.select(graft.functions.VectorOps.asDouble(col(vecCol)).as("v"))
      .na.drop("any").select(size(col("v"))).head()
    val d = probe.getInt(0)
    val model = pca(df, vecCol, d)
    val white = pcaWhiten(df, vecCol, model, "__w", eps)
    white.withColumn(outCol,
        graft.functions.VectorOps.dot(col("__w"), col("__w")))
      .drop("__w")
  }
}
