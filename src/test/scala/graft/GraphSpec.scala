package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // A -> B, B -> {A, C}, C dangling. N = 3, d = 0.85.
  private def triangle = Seq(
    ("A", "B", 1.0), ("B", "A", 1.0), ("B", "C", 1.0)
  ).toDF("src", "dst", "w")

  test("pageRank: one iteration matches the hand-rolled 6dp dynamics") {
    // Seed 0.333333 everywhere; dangling mass = r(C) = 0.333333.
    // base = 0.15/3 + 0.85 * (0.333333/3) = 0.14444435
    // contrib: B <- 0.333333 (A's full rank), A and C <- 0.1666665 each
    // r(A) = r(C) = round(base + 0.85*0.1666665, 6) = 0.286111
    // r(B) = round(base + 0.85*0.333333, 6)        = 0.427777
    val got = Graph.pageRank(triangle, "src", "dst", Some("w"),
        iterations = 1, scale = 6)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(got == Seq(("A", 0.286111), ("B", 0.427777), ("C", 0.286111)))
    // At the default 12-digit grid the same step is finer, not different:
    // all three terms build from round(1/3, 12).
    val fine = Graph.pageRank(triangle, "src", "dst", Some("w"), iterations = 1)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(math.abs(fine(1)._2 - 0.427777777777) < 1e-12, fine.toString)
  }

  test("pageRank: stays a distribution and ranks the hub highest at depth") {
    val got = Graph.pageRank(triangle, "src", "dst", Some("w"), iterations = 10)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-4, s"mass leaked: $got")
    assert(got("B") > got("A") && got("B") > got("C"),
      s"B receives A's whole rank plus half its own return flow: $got")
    // Symmetric two-cycle with equal weights: exactly uniform forever
    // (the rounded map has the uniform vector as a fixed point).
    val pair = Seq(("x", "y", 1.0), ("y", "x", 1.0)).toDF("src", "dst", "w")
    val uni = Graph.pageRank(pair, "src", "dst", Some("w"), iterations = 7)
      .select("rank").as[Double].collect().toSeq
    assert(uni == Seq(0.5, 0.5))
  }

  test("pageRank: parallel edges collapse by weight, self-loops feed back") {
    // Duplicate (A,B) rows must behave as one double-weight edge:
    // A's out-mass still all flows to B (shares normalize).
    val dup = Seq(("A", "B", 1.0), ("A", "B", 1.0), ("B", "A", 2.0))
      .toDF("src", "dst", "w")
    val one = Seq(("A", "B", 2.0), ("B", "A", 2.0)).toDF("src", "dst", "w")
    val a = Graph.pageRank(dup, "src", "dst", Some("w"), iterations = 5)
      .orderBy("node").as[(String, Double)].collect().toSeq
    val b = Graph.pageRank(one, "src", "dst", Some("w"), iterations = 5)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(a == b)
  }

  test("pageRank warm start: continuing a cold run is bit-identical") {
    val cold7 = Graph.pageRank(triangle, "src", "dst", Some("w"), iterations = 7)
    val warm = Graph.pageRank(triangle, "src", "dst", Some("w"),
        iterations = 3, seedRanks = Some(
          Graph.pageRank(triangle, "src", "dst", Some("w"), iterations = 4)))
      .orderBy("node").as[(String, Double)].collect().toSeq
    val cold = cold7.orderBy("node").as[(String, Double)].collect().toSeq
    assert(warm == cold, "warm(cold4, 3) must equal cold7 exactly")
    // After an edge delta, a short warm resume lands near the full cold
    // recompute — the incremental path earns its keep.
    val grown = triangle.unionByName(
      Seq(("C", "A", 1.0)).toDF("src", "dst", "w"))
    val coldFull = Graph.pageRank(grown, "src", "dst", Some("w"), iterations = 12)
      .as[(String, Double)].collect().toMap
    val warmDelta = Graph.pageRank(grown, "src", "dst", Some("w"),
        iterations = 4, seedRanks = Some(
          Graph.pageRank(triangle, "src", "dst", Some("w"), iterations = 12)))
      .as[(String, Double)].collect().toMap
    val cold4 = Graph.pageRank(grown, "src", "dst", Some("w"), iterations = 4)
      .as[(String, Double)].collect().toMap
    def l1(m: Map[String, Double]) =
      coldFull.keys.map(k => math.abs(coldFull(k) - m(k))).sum
    assert(l1(warmDelta) < l1(cold4),
      s"warm must be closer to the fixpoint than cold at equal rounds: " +
        s"${l1(warmDelta)} vs ${l1(cold4)}")
    assert(l1(warmDelta) < 0.05, s"and near it in absolute terms: ${l1(warmDelta)}")
  }

  test("wordCooccurrenceEdges: symmetric consecutive-pair counts") {
    val docs = Seq("x y x", "", "solo").toDF("text")
    val got = Graph.wordCooccurrenceEdges(docs, "text")
      .as[(String, String, Double)].collect().toSet
    // "x y x" -> directed pairs (x,y),(y,x); symmetrized both count 2.
    // Empty and single-token docs contribute nothing.
    assert(got == Set(("x", "y", 2.0), ("y", "x", 2.0)))
  }

  test("textRank: repeated hub word outranks the periphery") {
    val docs = Seq(
      "spark runs fast", "spark scales well", "spark joins tables",
      "cats sleep").toDF("text")
    val got = Graph.textRank(docs, "text", iterations = 10)
      .as[(String, Double)].collect().toMap
    val others = got.filterNot { case (w, _) => w == "spark" }.values
    assert(others.forall(got("spark") > _),
      s"'spark' touches every sentence and must dominate: $got")
  }
}
