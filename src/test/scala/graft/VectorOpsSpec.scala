package graft

import org.apache.spark.sql.functions.col

import graft.functions.VectorOps._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(a: Seq[Double], b: Seq[Double], f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b"))).collect()(0).getDouble(0)

  test("dot / norm / cosine") {
    assert(one(Seq(1, 2), Seq(3, 4), dot) == 11.0)
    assert(math.abs(one(Seq(1, 0), Seq(0, 1), cosine)) < 1e-12)
    assert(math.abs(one(Seq(1, 2, 3), Seq(2, 4, 6), cosine) - 1.0) < 1e-12)
    assert(math.abs(one(Seq(1, 0), Seq(-1, 0), cosine) + 1.0) < 1e-12)
  }

  test("hyperplane signature is deterministic and separates opposite vectors") {
    val planes = randomPlanes(8, 4, seed = 42L)
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0)),
      (2L, Seq(1.0, 2.0, 3.0, 4.0)),
      (3L, Seq(-1.0, -2.0, -3.0, -4.0))).toDF("id", "v")
    val sigs = df.select(col("id"), hyperplaneSignature(col("v"), planes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert((sigs(1L) ^ sigs(3L)) == 0xFFL) // all 8 sign bits flip for -v
  }
}
