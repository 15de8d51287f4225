package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SemanticDedup}

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

  test("no near-duplicates -> identity") {
    val (df, _) = fixture
    val base = df.filter(col("id") < 100)
    val kept = SemanticDedup.semanticDedup(base, "id", "v", nClusters = 4, minCosine = 0.999999)
      .count()
    assert(kept == 60)
  }
}
