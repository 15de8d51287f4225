package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingStats
import graft.sources.TableIO

/** The moment-fold family: covariance vs a naive reference, the PCA
  * basis contract (orthonormal, descending, variance-capturing,
  * sign-deterministic), projection variance == eigenvalue, and the
  * whitening identity (covariance of whitened output == I).
  */
class EmbeddingStatsSpec extends SparkSpec {
  import spark.implicits._

  // Anisotropic 3-d fixture: variance concentrated along (1, 1, 0)/√2,
  // a weaker axis along (0, 0, 1), almost nothing across (1, -1, 0).
  private lazy val aniso = {
    val rnd = new scala.util.Random(7)
    (0 until 400).map { i =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.0
      val c = rnd.nextGaussian() * 0.05
      (i.toLong, Array(
        (a + c) / math.sqrt(2) + 5.0,
        (a - c) / math.sqrt(2) - 2.0,
        b + 1.0).map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("covariance equals the naive per-pair computation") {
    val got = EmbeddingStats.covariance(aniso, "embedding")
      .as[(Int, Int, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    val rows = aniso.select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val mu = Array.tabulate(3)(d => rows.map(_(d)).sum / n)
    for (i <- 0 until 3; j <- i until 3) {
      val naive = rows.map(r => r(i) * r(j)).sum / n - mu(i) * mu(j)
      assert(math.abs(got((i, j)) - naive) < 1e-9,
        s"cov($i,$j): ${got((i, j))} vs naive $naive")
    }
  }

  test("pca basis: orthonormal, descending explained, finds the planted axes") {
    val m = EmbeddingStats.pca(aniso, "embedding", 3)
    for (i <- 0 until 3; j <- i until 3) {
      val dot = m.axes(i).zip(m.axes(j)).map(p => p._1 * p._2).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"axes ${i}x$j = $dot")
    }
    assert(m.explained.sliding(2).forall(p => p(0) >= p(1)),
      s"explained must descend: ${m.explained.toSeq}")
    // Dominant axis ≈ (1, 1, 0)/√2 (sign-canonicalized), and its
    // eigenvalue ≈ the planted 3² variance.
    val s2 = 1.0 / math.sqrt(2)
    val align = math.abs(m.axes(0)(0) * s2 + m.axes(0)(1) * s2)
    assert(align > 0.99, s"dominant axis alignment $align")
    assert(m.explained(0) > 7.0 && m.explained(0) < 11.0, m.explained(0).toString)
    // Deterministic up to partition-merge float order: the moments
    // reduce merges task results in completion order, so repeated fits
    // can differ by ~1 ulp (observed) — sign canonicalization kills
    // LAPACK's sign freedom, the tolerance absorbs the merge order.
    val again = EmbeddingStats.pca(aniso, "embedding", 3)
    val flat1: Array[Double] = m.axes.flatten
    val flat2: Array[Double] = again.axes.flatten
    flat1.indices.foreach { i =>
      assert(math.abs(flat1(i) - flat2(i)) < 1e-9, s"${flat1(i)} vs ${flat2(i)}")
    }
  }

  test("projection: per-axis variance equals the eigenvalue, mean maps to 0") {
    val m = EmbeddingStats.pca(aniso, "embedding", 2)
    val proj = EmbeddingStats.pcaProject(aniso, "embedding", m, "p")
    val stats = proj.select(
        variance(element_at($"p", 1)).as("v1"),
        variance(element_at($"p", 2)).as("v2"),
        avg(element_at($"p", 1)).as("m1"),
        avg(element_at($"p", 2)).as("m2"))
      .head()
    val n = 400.0
    // pca explained is the population eigenvalue; variance() is sample.
    assert(math.abs(stats.getDouble(0) * (n - 1) / n - m.explained(0)) < 1e-6)
    assert(math.abs(stats.getDouble(1) * (n - 1) / n - m.explained(1)) < 1e-6)
    assert(math.abs(stats.getDouble(2)) < 1e-9, "centered: projected mean ~ 0")
    assert(math.abs(stats.getDouble(3)) < 1e-9)
  }

  test("whitening: covariance of the whitened output is the identity") {
    val m = EmbeddingStats.pca(aniso, "embedding", 3)
    val white = EmbeddingStats.pcaWhiten(aniso, "embedding", m, "w")
      .select($"vec_id", $"w".as("embedding"))
    val cov = EmbeddingStats.covariance(white, "embedding")
      .as[(Int, Int, Double)].collect()
    cov.foreach { case (i, j, c) =>
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 1e-6, s"whitened cov($i,$j) = $c")
    }
  }

  test("whitening drops degenerate axes instead of amplifying noise") {
    // Rank-2 data in 3-d: the third eigenvalue is ~0; its whitened
    // coordinate must be exactly 0, not 1/sqrt(eps)-scaled noise.
    val flat = (0 until 100).map { i =>
      (i.toLong, Array((i % 7).toFloat, (i % 5).toFloat,
        ((i % 7) + (i % 5)).toFloat))
    }.toDF("vec_id", "embedding")
    val m = EmbeddingStats.pca(flat, "embedding", 3)
    assert(m.explained(2) < 1e-9)
    val mx = EmbeddingStats.pcaWhiten(flat, "embedding", m, "w")
      .select(max(abs(element_at($"w", 3)))).head().getDouble(0)
    assert(mx == 0.0, s"degenerate axis must zero out, got $mx")
  }

  test("mahalanobis: affine-invariant, chi-square mean band, planted outlier tops") {
    import graft.operators.EmbeddingStats.mahalanobisScore
    // Gaussian cloud + one outlier planted along the LOW-variance
    // direction (1,-1,0)/√2 at modest euclidean distance — euclidean
    // ranking misses it, Mahalanobis must not.
    val rnd = new scala.util.Random(11)
    val base = (0 until 400).map { i =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.0
      val c = rnd.nextGaussian() * 0.05
      (i.toLong, Array((a + c) / math.sqrt(2), (a - c) / math.sqrt(2), b))
    }
    val s2 = math.sqrt(2)
    val outlier = (999L, Array(1.0 / s2, -1.0 / s2, 0.0)) // 1.0 across the 0.05 axis
    val docs = (base :+ outlier).toDF("vec_id", "embedding")
    val scores = mahalanobisScore(docs, "embedding", "d2")
      .select($"vec_id", $"d2").as[(Long, Double)].collect().toMap
    assert(scores.maxBy(_._2)._1 == 999L,
      "the tight-direction outlier must have the largest D2")
    // For d-dim gaussian data E[D2] = d (here the outlier barely moves it).
    val mean = scores.values.sum / scores.size
    assert(mean > 2.0 && mean < 4.0, s"chi-square mean band: $mean vs d=3")

    // Affine invariance: scaling a feature 100x changes nothing.
    val scaled = docs.select($"vec_id",
      array(element_at($"embedding", 1) * 100.0,
        element_at($"embedding", 2), element_at($"embedding", 3)).as("embedding"))
    val scaledScores = mahalanobisScore(scaled, "embedding", "d2")
      .select($"vec_id", $"d2").as[(Long, Double)].collect().toMap
    scores.foreach { case (id, v) =>
      assert(math.abs(scaledScores(id) - v) < 1e-6,
        s"affine invariance broken at $id: $v vs ${scaledScores(id)}")
    }
  }

  test("fixture round-trip: sf0.001 embeddings whiten to identity covariance") {
    val emb = TableIO.table(spark, Sf0001, "embeddings")
    val m = EmbeddingStats.pca(emb, "embedding", 8)
    val white = EmbeddingStats.pcaWhiten(emb, "embedding", m, "w")
      .select($"vec_id", $"w".as("embedding"))
    val offenders = EmbeddingStats.covariance(white, "embedding")
      .filter(abs($"cov" - when($"i" === $"j", 1.0).otherwise(0.0)) > 1e-6)
      .count()
    assert(offenders == 0L)
  }
}
