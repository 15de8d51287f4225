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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Random-hyperplane LSH bucket id: bit i = sign(v . plane_i). Planes
    * come from a seeded RNG, so the signature is deterministic — the
    * bucketing join for ANN search is reproducible run to run.
    */
  def hyperplaneSignature(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p.toSeq)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Deterministic gaussian-ish hyperplanes from a seed. */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }
}
