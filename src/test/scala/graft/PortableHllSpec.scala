package graft

import org.apache.spark.sql.functions._

import graft.operators.PortableHll

class PortableHllSpec extends SparkSpec {
  import spark.implicits._

  // JVM reference: (register, rho) per value, exactly the operator's
  // documented hash layout (b=8: 2 hex chars register, next 13 rank).
  private def refRegRho(v: String): (Long, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val reg = java.lang.Long.parseLong(hex.substring(0, 2), 16)
    val w = java.lang.Long.parseLong(hex.substring(2, 15), 16)
    val rho = if (w == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (reg, rho)
  }

  test("registers: matches the JVM hash-layout reference on 200 values") {
    val df = (1 to 200).map(i => ("g", i.toLong)).toDF("g", "v")
    val got = PortableHll.registers(df, "g", col("v"))
      .as[(String, Long, Int)].collect()
      .map { case (_, r, rho) => r -> rho }.toMap
    val want = (1 to 200).map(i => refRegRho(i.toString))
      .groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2).max }
    assert(got == want)
  }

  test("estimate: within 3-sigma HLL error of the true cardinality") {
    // m=256 -> relative std error 1.04/16 = 6.5%; allow 3 sigma = 20%.
    for (n <- Seq(1000, 5000, 20000)) {
      val df = (1 to n).map(i => ("g", s"user_$i")).toDF("g", "v")
      val est = PortableHll.distinctApprox(df, "g", col("v"))
        .collect().head.getDouble(2)
      assert(math.abs(est - n) < 0.20 * n,
        s"n=$n est=$est off by ${math.abs(est - n) / n}")
    }
  }

  test("estimate: duplicates never move the sketch; nulls skipped; deterministic") {
    val base = (1 to 500).map(i => ("g", s"u$i")).toDF("g", "v")
    val dup = base.unionByName(base).unionByName(base)
    val a = PortableHll.distinctApprox(base, "g", col("v")).collect().head
    val b = PortableHll.distinctApprox(dup, "g", col("v")).collect().head
    assert(a == b)
    val withNull = base.unionByName(Seq(("g", null: String)).toDF("g", "v"))
    val c = PortableHll.distinctApprox(withNull, "g", col("v")).collect().head
    assert(a == c)
    val again = PortableHll.distinctApprox(base, "g", col("v")).collect().head
    assert(a == again)
  }

  test("merge: sharded registers fold to the one-shot sketch bit for bit") {
    val df = (1 to 3000).map(i => (s"t${i % 3}", s"u${i % 1100}")).toDF("g", "v")
    val oneShot = PortableHll.registers(df, "g", col("v"))
    val shards = (0 to 3).map(s =>
      PortableHll.registers(df.filter(pmod(col("v").substr(2, 10).cast("long"), lit(4)) === s),
        "g", col("v")))
    val merged = PortableHll.merge(shards: _*)
    assert(merged.collect().toSet == oneShot.collect().toSet)
    assert(PortableHll.estimate(merged, "g").collect().toSet ==
      PortableHll.estimate(oneShot, "g").collect().toSet)
  }

  test("estimateCorrected: linear counting engages only in the small-V regime") {
    // 20 distinct << 2.5 * 256: V > 0 certain, correction must engage.
    val small = (1 to 20).map(i => ("g", s"u$i")).toDF("g", "v")
    val r = PortableHll.estimateCorrected(
      PortableHll.registers(small, "g", col("v")), "g").collect().head
    val v = r.getLong(1)
    assert(v > 0)
    val lc = math.rint(256.0 * math.log(256.0 / v) * 1e4) / 1e4
    assert(r.getDouble(3) == lc)
    // corrected is far more accurate than raw at tiny cardinality
    assert(math.abs(r.getDouble(3) - 20) < math.abs(r.getDouble(2) - 20) + 1e-9)
  }

  test("overlapEstimate: known half-overlap tracked; disjoint floors at 0") {
    // A = 1..1000, B = 501..1500: true union 1500, intersection 500.
    // C = 9001..10000: disjoint from both.
    val rows = (1 to 1000).map(i => ("A", s"u$i")) ++
      (501 to 1500).map(i => ("B", s"u$i")) ++
      (9001 to 10000).map(i => ("C", s"u$i"))
    val got = PortableHll.overlapEstimate(rows.toDF("g", "v"), "g", col("v"))
      .orderBy("ga", "gb").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = got(("A", "B"))
    val (ea, eb, eu, ei) = (ab.getDouble(2), ab.getDouble(3),
      ab.getDouble(4), ab.getDouble(5))
    assert(math.abs(eu - 1500) / 1500 < 0.15, s"union est off: $eu")
    assert(math.abs(ei - 500) / 500 < 0.35, s"intersection est off: $ei")
    // identity: intersection is exactly the floored inclusion-exclusion
    val want = math.max(0.0,
      BigDecimal(ea + eb - eu).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(ei == want)
    assert(ab.getDouble(6) ==
      BigDecimal(ei / eu).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // disjoint pairs: floored at 0, jaccard ~0
    for (k <- Seq(("A", "C"), ("B", "C"))) {
      val r = got(k)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 120.0,
        s"disjoint intersection should be ~0: $r")
    }
  }
}
