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

  test("personalizedPageRank: mass stays near seeds, unreachable components get zero") {
    // Two components: seed component s -> a -> b (b dangling), and an
    // unreachable x -> y. Teleport lands only on the seed, so the
    // unreachable pair must hold rank EXACTLY 0 (not small — zero:
    // teleport never lands there and no edge reaches them), and the
    // dangling b's mass must flow back to s via the dm*p term.
    val edges = Seq(("s", "a"), ("a", "b"), ("x", "y")).toDF("src", "dst")
    val seeds = Seq("s").toDF("node")
    val got = Graph.personalizedPageRank(edges, "src", "dst", seeds,
        iterations = 10)
      .as[(String, Double)].collect().toMap
    assert(got("x") == 0.0 && got("y") == 0.0)
    assert(math.abs(got("s") + got("a") + got("b") - 1.0) < 1e-6,
      s"seed-component mass must be ~1: $got")
    assert(got("s") > got("b"), "teleport + dangling return concentrate on the seed")
    // Multi-seed: p splits uniformly; a seed absent from the graph is
    // ignored (normalization over PRESENT seeds only).
    val got2 = Graph.personalizedPageRank(edges, "src", "dst",
        Seq("s", "x", "ghost").toDF("node"), iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(got2("y") > 0.0, "x seeded -> its component now holds mass")
    assert(math.abs(got2.values.sum - 1.0) < 1e-6)
    // All seeds absent -> loud failure, not a silent zero vector.
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, "src", "dst",
        Seq("ghost").toDF("node"), iterations = 2).collect()
    }
  }

  test("hits: one iteration matches the hand-rolled L1 dynamics") {
    // h1 -> {a1, a2}, h2 -> {a1}. 4 nodes, h0 = 0.25 each.
    // a_raw: a1 = 0.5, a2 = 0.25, hubs 0; L1 total 0.75:
    //   a(a1) = round(0.5/0.75, 12)  = 0.666666666667
    //   a(a2) = round(0.25/0.75, 12) = 0.333333333333
    // h_raw: h1 = a(a1)+a(a2) = 1.0 (rounded doubles sum exactly here),
    //        h2 = a(a1); total 1.666666666667:
    //   h(h1) = round(1.0/1.666666666667, 12)
    //   h(h2) = round(0.666666666667/1.666666666667, 12)
    val edges = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a1")).toDF("s", "d")
    val got = Graph.hits(edges, "s", "d", iterations = 1)
      .as[(String, Double, Double)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap
    // Spark round(x, 12) = BigDecimal.valueOf(x).setScale(12, HALF_UP).
    def r12(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got("a1")._2 == 0.666666666667 && got("a2")._2 == 0.333333333333)
    assert(got("a1")._1 == 0.0 && got("a2")._1 == 0.0)
    assert(got("h1")._1 == r12(1.0 / 1.666666666667))
    assert(got("h2")._1 == r12(0.666666666667 / 1.666666666667))
    assert(got("h1")._2 == 0.0 && got("h2")._2 == 0.0)
  }

  test("hits: authorities separate by in-link mass, vectors stay L1-normalized") {
    // Star: many hubs all point at "center", one also at "side".
    val edges = (1 to 8).map(i => (s"h$i", "center")).toDF("s", "d")
      .unionByName(Seq(("h1", "side")).toDF("s", "d"))
    val got = Graph.hits(edges, "s", "d", iterations = 5)
      .as[(String, Double, Double)].collect()
    val byNode = got.map { case (n, h, a) => n -> (h, a) }.toMap
    assert(byNode("center")._2 > byNode("side")._2,
      "8-in-link node must out-authority the 1-in-link node")
    // h1 links both authorities -> strictly better hub than h2..h8.
    assert(byNode("h1")._1 > byNode("h2")._1)
    // L1 mass ~1 on both vectors (rounding residue only).
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-6)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-6)
    // Parallel edges collapse: duplicating the whole edge list is a no-op.
    val dup = Graph.hits(
      edges.unionByName(edges), "s", "d", iterations = 5)
      .as[(String, Double, Double)].collect().toSet
    assert(dup == got.toSet)
  }
}
