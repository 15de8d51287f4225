package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile
import graft.sources.TableIO

class ProfileSpec extends SparkSpec {

  private def byColumn(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("column") -> r).toMap

  test("approx mode: everything but n_distinct identical to exact; sketch within 10%") {
    val events = TableIO.table(spark, Sf0001, "events")
    val exact = byColumn(Profile.profile(events, exactDistinct = true))
    val approx = byColumn(Profile.profile(events))
    assert(exact.keySet == approx.keySet)
    exact.keySet.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      // The approx mode changes ONLY the distinct estimator: counts,
      // nulls, types and ranges come from the same fused aggregation.
      Seq("data_type", "n_rows", "n_nulls", "min_value", "max_value").foreach { f =>
        assert(e.getAs[Any](f) == a.getAs[Any](f), s"$c.$f diverged")
      }
      val ed = e.getAs[Long]("n_distinct")
      val ad = a.getAs[Long]("n_distinct")
      // HLL++ at default rsd 5%: a 10% band is comfortable and stable.
      assert(math.abs(ad - ed) <= math.max(1L, (0.10 * ed).toLong),
        s"$c: approx distinct $ad vs exact $ed")
    }
  }

  test("mergeable state: sharding exact on counts/ranges, order-invariant on distincts") {
    val events = TableIO.table(spark, Sf0001, "events")
    val oneShot = byColumn(Profile.profileFromState(Profile.profileState(events)))
    // Shard by an arbitrary predicate — counts and ranges must be EXACT.
    val a = Profile.profileState(events.filter(col("event_id") % 3 === 0))
    val b = Profile.profileState(events.filter(col("event_id") % 3 =!= 0))
    val merged = byColumn(Profile.profileFromState(Profile.mergeProfileStates(a, b)))
    assert(oneShot.keySet == merged.keySet)
    oneShot.keySet.foreach { c =>
      Seq("data_type", "n_rows", "n_nulls", "min_value", "max_value").foreach { f =>
        assert(oneShot(c).getAs[Any](f) == merged(c).getAs[Any](f),
          s"$c.$f: ${oneShot(c).getAs[Any](f)} vs ${merged(c).getAs[Any](f)}")
      }
      // Distinct estimates: DataSketches unions run HLL_8 while fresh
      // sketches are HLL_4, so the two paths are distinct estimators of
      // the same truth — deviation bounded by the sketch's own error
      // (~1.6% rsd at lgK=12; observed 1.5% max). Pin at 5%.
      val e = oneShot(c).getAs[Long]("n_distinct")
      val m = merged(c).getAs[Long]("n_distinct")
      assert(math.abs(m - e) <= math.max(1L, (0.05 * e).toLong),
        s"$c: merged distinct $m vs one-shot $e")
    }
    // Merge order/association: every path is an estimator within the
    // same error band (exact register equality is path-dependent in
    // DataSketches' HLL_4/HLL_8 conversions, so only closeness is a
    // contract, not identity).
    val s0 = Profile.profileState(events.filter(col("event_id") % 3 === 0))
    val s1 = Profile.profileState(events.filter(col("event_id") % 3 === 1))
    val s2 = Profile.profileState(events.filter(col("event_id") % 3 === 2))
    val left = byColumn(Profile.profileFromState(
      Profile.mergeProfileStates(Profile.mergeProfileStates(s0, s1), s2)))
    val right = byColumn(Profile.profileFromState(
      Profile.mergeProfileStates(s2, Profile.mergeProfileStates(s1, s0))))
    left.keySet.foreach { c =>
      val (l, r) = (left(c).getAs[Long]("n_distinct"), right(c).getAs[Long]("n_distinct"))
      assert(math.abs(l - r) <= math.max(1L, (0.05 * l).toLong),
        s"$c merge-order variance: $l vs $r")
    }
  }

  test("state render matches profile() conventions on the exact fields") {
    val events = TableIO.table(spark, Sf0001, "events")
    val direct = byColumn(Profile.profile(events, exactDistinct = true))
    val viaState = byColumn(Profile.profileFromState(Profile.profileState(events)))
    direct.keySet.foreach { c =>
      // Counts and rendered ranges are exact in both paths; only the
      // distinct estimator differs (HLL sketch vs exact/HLL++).
      Seq("data_type", "n_rows", "n_nulls", "min_value", "max_value").foreach { f =>
        assert(direct(c).getAs[Any](f) == viaState(c).getAs[Any](f),
          s"$c.$f: ${direct(c).getAs[Any](f)} vs ${viaState(c).getAs[Any](f)}")
      }
      val ed = direct(c).getAs[Long]("n_distinct")
      val sd = viaState(c).getAs[Long]("n_distinct")
      assert(math.abs(sd - ed) <= math.max(1L, (0.10 * ed).toLong),
        s"$c: state distinct $sd vs exact $ed")
    }
  }

  test("null accounting: n_rows - count(col) lands in n_nulls") {
    val df = spark.range(100).toDF("id")
      .withColumn("x", when(col("id") % 4 === 0, col("id")))
    val p = byColumn(Profile.profile(df, exactDistinct = true))
    assert(p("x").getAs[Long]("n_nulls") == 75L)
    assert(p("x").getAs[Long]("n_rows") == 100L)
    assert(p("id").getAs[Long]("n_nulls") == 0L)
  }

  test("skewReport: heavy key ranked first, shares and ratio exact") {
    import spark.implicits._
    // Keys: "hot" x 8, "warm" x 2, a..e x 1 -> 15 rows, 7 keys,
    // mean = 15/7, skew_ratio = 8/(15/7) = 3.733333.
    val df = (Seq.fill(8)("hot") ++ Seq.fill(2)("warm") ++
      Seq("a", "b", "c", "d", "e")).toDF("k")
    val got = Profile.skewReport(df, "k", topK = 3).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(got(0).getString(1) == "hot" && got(0).getLong(2) == 8L)
    assert(got(0).getDouble(got(0).fieldIndex("share")) == 0.533333)
    assert(got(0).getDouble(got(0).fieldIndex("skew_ratio")) == 3.733333)
    // Count ties break by key ascending.
    assert(got(1).getString(1) == "warm" && got(2).getString(1) == "a")
  }

  test("correlationMatrix: exact lines, hand value, pairwise deletion, null guards") {
    import spark.implicits._
    val df = Seq(
      (1.0, 2.0, 1.0, 5.0, Option(1.0)),
      (2.0, 4.0, 3.0, 5.0, Option(2.0)),
      (3.0, 6.0, 2.0, 5.0, None)
    ).toDF("x", "y2x", "z", "const", "holey")
    val got = Profile.correlationMatrix(df,
        Seq("x", "y2x", "z", "const", "holey"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(("x", "y2x")) == (3L, Some(1.0)), "y = 2x is a perfect line")
    // x=[1,2,3], z=[1,3,2]: Sxy=13 -> r = (3*13-6*6)/sqrt((3*14-36)^2) = 0.5
    assert(got(("x", "z")) == (3L, Some(0.5)))
    assert(got(("x", "const"))._2.isEmpty, "zero variance -> null, not NaN")
    // Pairwise deletion: the holey column only has 2 rows vs x; those
    // two are a perfect line.
    assert(got(("x", "holey")) == (2L, Some(1.0)))
    assert(got.size == 10, "all C(5,2) pairs present")
  }

  test("histogram: frozen edges, out-of-range clamps, shares sum to 1") {
    import spark.implicits._
    val df = Seq(
      ("g", -5.0),  // clamps into bin 0
      ("g", 0.0), ("g", 9.99),          // bin 0
      ("g", 10.0), ("g", 15.0),         // bin 1
      ("g", 999.0),                     // clamps into bin 4
      ("g", Double.NaN)                 // placeholder -> null below
    ).toDF("g", "v")
      .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
    val got = Profile.histogram(df, "g", "v", bins = 5, lo = 0.0, hi = 50.0)
      .orderBy("bin")
      .select("bin", "bin_lo", "bin_hi", "n", "share")
      .as[(Long, Double, Double, Long, Double)].collect()
    assert(got.map(r => (r._1, r._4)).toSeq == Seq((0L, 3L), (1L, 2L), (4L, 1L)))
    assert(got.head._2 == 0.0 && got.head._3 == 10.0)
    assert(got.last._2 == 40.0 && got.last._3 == 50.0)
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-9)
    assert(got.map(_._4).sum == 6L, "null dropped, clamped rows kept")
  }
}
