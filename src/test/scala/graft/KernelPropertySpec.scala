package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Kernels, TopKHeap}

/** Pure-JVM property pins for the round-8 kernels — no Spark session,
  * thousands of cases are cheap.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, cases: Int = 500): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val pqCase: Gen[(Array[Double], Array[Double], Int, Int, Int)] = for {
    m <- Gen.choose(1, 4)
    kc <- Gen.choose(1, 8)
    subDim <- Gen.choose(1, 5)
    seed <- Gen.choose(0L, 10000L)
  } yield {
    val rnd = new scala.util.Random(seed)
    val cb = Array.fill(m * kc * subDim)(rnd.nextDouble() * 10 - 5)
    val v = Array.fill(m * subDim)(rnd.nextDouble() * 10 - 5)
    (v, cb, m, kc, subDim)
  }

  test("pq codes are bounded and encode∘decode is a fixpoint") {
    check(Prop.forAll(pqCase) { case (v, cb, m, kc, subDim) =>
      val codes = Kernels.pqEncode(new GenericArrayData(v), cb, m, kc, subDim)
      val bounded = (0 until m).forall(i => codes.getInt(i) >= 0 && codes.getInt(i) < kc)
      val dec = Kernels.pqDecode(codes, cb, m, kc, subDim)
      val codes2 = Kernels.pqEncode(dec, cb, m, kc, subDim)
      // re-encoding a reconstruction returns the same codes (distance 0
      // to its own centroid; random codebooks have no duplicate rows)
      val fix = (0 until m).forall(i => codes.getInt(i) == codes2.getInt(i))
      bounded && fix
    })
  }

  test("ADC against a query LUT equals dot(query, reconstruction)") {
    check(Prop.forAll(pqCase) { case (v, cb, m, kc, subDim) =>
      val rnd = new scala.util.Random(v.map(_.hashCode.toLong).sum)
      val q = Array.fill(m * subDim)(rnd.nextDouble() * 4 - 2)
      val codes = Kernels.pqEncode(new GenericArrayData(v), cb, m, kc, subDim)
      val lut = new Array[Double](m * kc)
      for (sub <- 0 until m; c <- 0 until kc) {
        val base = (sub * kc + c) * subDim
        lut(sub * kc + c) =
          (0 until subDim).map(j => q(sub * subDim + j) * cb(base + j)).sum
      }
      val adc = Kernels.pqAdc(codes, lut, kc)
      val dec = Kernels.pqDecode(codes, cb, m, kc, subDim)
      val dot = (0 until m * subDim).map(j => q(j) * dec.getDouble(j)).sum
      math.abs(adc - dot) <= 1e-9 * (1 + math.abs(dot))
    })
  }

  test("matVec with a seeded rotation preserves norms and inner products") {
    val rot = graft.operators.Quantization.seededRotation(16, 7L).toArray
    check(Prop.forAll(Gen.choose(0L, 100000L)) { seed =>
      val rnd = new scala.util.Random(seed)
      val a = Array.fill(16)(rnd.nextDouble() * 10 - 5)
      val b = Array.fill(16)(rnd.nextDouble() * 10 - 5)
      val ra = Kernels.matVec(new GenericArrayData(a), rot, 16)
      val rb = Kernels.matVec(new GenericArrayData(b), rot, 16)
      def dot(x: Int => Double, y: Int => Double) = (0 until 16).map(i => x(i) * y(i)).sum
      val before = dot(a, b)
      val after = dot(ra.getDouble, rb.getDouble)
      math.abs(before - after) <= 1e-8 * (1 + math.abs(before))
    }, cases = 200)
  }

  test("signPack/hammingTo equal the naive per-dimension reference") {
    val vecGen: Gen[(Array[Double], Array[Double])] = for {
      d <- Gen.choose(1, 200)
      seed <- Gen.choose(0L, 100000L)
    } yield {
      val rnd = new scala.util.Random(seed)
      // include exact zeros: the contract is strictly x > 0
      def v() = Array.fill(d)(rnd.nextInt(5) match {
        case 0 => 0.0
        case _ => rnd.nextGaussian()
      })
      (v(), v())
    }
    check(Prop.forAll(vecGen) { case (a, b) =>
      val pa = Kernels.signPack(new GenericArrayData(a))
      val pb = Kernels.signPack(new GenericArrayData(b))
      val naive = a.indices.count(i => (a(i) > 0) != (b(i) > 0))
      pa.numElements() == (a.length + 63) / 64 &&
        Kernels.hammingTo(pa, pb.toLongArray()) == naive
    }, cases = 1000)
  }

  test("tokenSetBest equals the k-fold tokenSetCount argmax reference") {
    import org.apache.spark.unsafe.types.UTF8String
    // vocab deliberately overlaps across sets ("de"/"la" style shared
    // stopwords) and includes non-members, so ties and zero-hit docs
    // are common — the semantics under test are first-strict-max and
    // the zero-hit fallback label.
    val vocab = Seq("the", "la", "de", "und", "le", "el", "x", "é世", "b1")
    val docGen: Gen[String] = for {
      k <- Gen.choose(0, 40)
      toks <- Gen.listOfN(k, Gen.oneOf(vocab))
      seps <- Gen.listOfN(k + 1, Gen.oneOf(" ", "  ", "\t", "\n"))
    } yield seps.head + toks.zip(seps.tail).map { case (t, s) => t + s }.mkString
    val setsGen: Gen[Seq[Seq[String]]] = for {
      ns <- Gen.choose(1, 5)
      sets <- Gen.listOfN(ns, Gen.someOf(vocab).map(_.toSeq))
    } yield sets
    check(Prop.forAll(docGen, setsGen) { (s: String, sets: Seq[Seq[String]]) =>
      val labels = sets.indices.map(i => s"L$i") :+ "FALLBACK"
      val hashSets = sets.map { set =>
        val h = new java.util.HashSet[UTF8String]()
        set.foreach(w => h.add(UTF8String.fromString(w)))
        h
      }.toArray
      // reference: k independent tokenSetCount kernels + first-strict-max
      val counts = hashSets.map(Kernels.tokenSetCount(UTF8String.fromString(s), _))
      val expected =
        if (counts.isEmpty || counts.max == 0) "FALLBACK"
        else labels(counts.indexOf(counts.max))
      Kernels.tokenSetBest(UTF8String.fromString(s), hashSets,
        labels.map(UTF8String.fromString).toArray).toString == expected
    }, cases = 2000)
  }

  test("topGramFrac equals the naive max-multiplicity reference") {
    import org.apache.spark.unsafe.types.UTF8String
    val docGen: Gen[String] = for {
      k <- Gen.choose(0, 30)
      toks <- Gen.listOfN(k, Gen.oneOf("foo", "bar", "a", "b1", "é世", "x"))
      seps <- Gen.listOfN(k + 1, Gen.oneOf(" ", "  ", "\t", "\n"))
    } yield seps.head + toks.zip(seps.tail).map { case (t, s) => t + s }.mkString
    check(Prop.forAll(docGen, Gen.choose(1, 4)) { (s: String, n: Int) =>
      val toks = s.split("\\s+").filter(_.nonEmpty).toSeq
      val expected =
        if (toks.length < n) 0.0
        else {
          val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
          grams.groupBy(identity).values.map(_.size).max.toDouble / grams.size
        }
      Kernels.topGramFrac(UTF8String.fromString(s), n) == expected
    }, cases = 2000)
  }

  test("TopKHeap equals the sort-based reference, NaN included") {
    val entryGen = for {
      n <- Gen.choose(0, 30)
      k <- Gen.choose(1, 8)
      seed <- Gen.choose(0L, 100000L)
    } yield (n, k, seed)
    check(Prop.forAll(entryGen) { case (n, k, seed) =>
      val rnd = new scala.util.Random(seed)
      val entries = (0 until n).map { i =>
        val v = rnd.nextInt(5) match {
          case 0 => Double.NaN
          case _ => rnd.nextInt(6).toDouble // dense ties
        }
        (v, i.toLong)
      }
      val heap = new TopKHeap(k)
      entries.foreach { case (v, id) => heap.offer(v, id) }
      val got = heap.sorted.toSeq.map { case (v, id) => (java.lang.Double.doubleToLongBits(v), id) }
      // Spark keep-order: value desc with NaN largest, id asc on ties
      val want = entries
        .sortWith { case ((v1, i1), (v2, i2)) =>
          val c = if (v1 == v2) 0 else java.lang.Double.compare(v1, v2)
          c > 0 || (c == 0 && i1 < i2)
        }
        .take(k)
        .map { case (v, id) => (java.lang.Double.doubleToLongBits(v), id) }
      got == want
    })
  }

  // --- fused portable MinHash vs the r15a formulation, pure JVM ---

  private def refMinhashSig(s: String, n: Int, perms: Int): Seq[Long] = {
    val toks = s.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val sig = Array.fill(perms)(Long.MaxValue)
    for (i <- 0 to toks.length - n) {
      val g = toks.slice(i, i + n).mkString(" ")
      md.reset()
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h0 = java.lang.Long.parseLong(hex.substring(0, 13), 16)
      val lo = h0 & 67108863L
      val hi = h0 >>> 26
      var p = 0
      while (p < perms) {
        val a = ((2L * p + 1L) * 25214903917L) & 137438953471L
        val m = (((lo * a) & 4503599627370495L)
          + ((hi * a) & 67108863L) * 67108864L
          + p.toLong * 2654435769L) & 4503599627370495L
        if (m < sig(p)) sig(p) = m
        p += 1
      }
    }
    sig.toSeq
  }

  private val textGen: Gen[String] = {
    val token = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ü', '中', '文', '.', ','))).map(_.mkString)
    val ws = Gen.nonEmptyListOf(Gen.oneOf(' ', '\t', '\n', '\r')).map(_.mkString)
    for {
      k <- Gen.choose(0, 12)
      toks <- Gen.listOfN(k, token)
      seps <- Gen.listOfN(k + 1, ws)
      lead <- Gen.oneOf("", " ", "\t")
    } yield lead + toks.zip(seps).map { case (t, w) => t + w }.mkString
  }

  test("minhashSig: fused byte pass equals the gram-string md5+affine reference") {
    val gen = for {
      s <- textGen
      n <- Gen.choose(2, 4)
      perms <- Gen.oneOf(4, 16)
    } yield (s, n, perms)
    check(Prop.forAll(gen) { case (s, n, perms) =>
      val got = Kernels.minhashSig(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), n, perms)
      val want = refMinhashSig(s, n, perms)
      got.toLongArray().toSeq == want
    })
  }
}
