package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletionKeys: the string plus each one-char deletion, deduped") {
    val got = Seq("cat").toDF("s")
      .select(FuzzyJoin.deletionKeys(col("s"))).as[Seq[String]].collect().head
    assert(got.toSet == Set("cat", "at", "ct", "ca"))
    // Duplicate deletions collapse ("aa" -> "a" once).
    val dup = Seq("aa").toDF("s")
      .select(FuzzyJoin.deletionKeys(col("s"))).as[Seq[String]].collect().head
    assert(dup == Seq("aa", "a"))
  }

  test("join: finds substitution, insertion, deletion; excludes distance 2") {
    val left = Seq((1L, "kitten"), (2L, "flour")).toDF("lid", "ls")
    val right = Seq(
      (10L, "mitten"),  // substitution of k -> distance 1 to kitten
      (11L, "kittens"), // insertion -> distance 1 to kitten
      (12L, "itten"),   // deletion -> distance 1 to kitten
      (13L, "mittens"), // distance 2 to kitten: must NOT match
      (14L, "flour")    // identical -> distance 0
    ).toDF("rid", "rs")
    val got = FuzzyJoin.join(left, right, "lid", "ls", "rid", "rs")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 10L, 1), (1L, 11L, 1), (1L, 12L, 1), (2L, 14L, 0)))
  }

  test("join: exactly equals the brute-force all-pairs result") {
    // A deterministic word cloud with planted near-misses: the blocked
    // join must lose NOTHING vs brute force (FastSS soundness).
    val words = Seq("spark", "spork", "stork", "spars", "sprak", "park",
      "sparkle", "shark", "sharp", "spar", "scala", "scale", "whale")
    val left = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("lid", "ls")
    val right = words.reverse.zipWithIndex
      .map { case (w, i) => (100L + i, w) }.toDF("rid", "rs")
    val got = FuzzyJoin.join(left, right, "lid", "ls", "rid", "rs")
      .as[(Long, Long, Int)].collect().toSet
    val brute = left.crossJoin(right)
      .withColumn("d", levenshtein(col("ls"), col("rs")))
      .filter(col("d") <= 1)
      .select("lid", "rid", "d").as[(Long, Long, Int)].collect().toSet
    assert(got == brute, s"blocked=${got.size} brute=${brute.size}")
    assert(brute.exists(_._3 == 1), "fixture must contain real near-misses")
  }
}
