package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{BehavioralFeatures, Dedup, Skew}

/** Property-based invariants (SURVEY §5 tier 2) via raw ScalaCheck
  * (no scalatest bridge in the offline cache). Few cases per property —
  * each case runs Spark jobs.
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(prop: Prop, cases: Int = 5): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val eventsGen: Gen[List[(Long, Long, Long, Double)]] =
    Gen.nonEmptyListOf(for {
      user <- Gen.choose(0L, 4L)
      ts <- Gen.choose(0L, 7200L)
      value <- Gen.choose(0, 10000).map(_ / 100.0)
    } yield (user, ts, value)).map(_.zipWithIndex.map {
      case ((u, t, v), i) => (i.toLong, u, t, v)
    })

  private def toDf(rows: List[(Long, Long, Long, Double)]): DataFrame =
    rows.toDF("event_id", "user_id", "ts_unix", "value")

  test("trailing count is >= 1 and monotone in window length") {
    check(Prop.forAll(eventsGen) { rows =>
      val df = toDf(rows)
      val out = df.select(
        BehavioralFeatures.trailingCount("user_id", "ts_unix", 600L).as("c_short"),
        BehavioralFeatures.trailingCount("user_id", "ts_unix", 3600L).as("c_long"))
        .collect()
      out.forall(r => r.getLong(0) >= 1L && r.getLong(1) >= r.getLong(0))
    })
  }

  test("window features are invariant to input row order") {
    check(Prop.forAll(eventsGen) { rows =>
      def features(d: DataFrame) = d.select(
        col("event_id"),
        BehavioralFeatures.trailingCount("user_id", "ts_unix", 1800L).as("c"),
        BehavioralFeatures.trailingDistinct(col("value"), "user_id", "ts_unix", 1800L).as("d"))
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      features(toDf(rows)) == features(toDf(scala.util.Random.shuffle(rows)))
    }, cases = 3)
  }

  test("chronological split partitions the input exactly") {
    val tsGen = Gen.nonEmptyListOf(Gen.choose(0L, 200L)).map(_.zipWithIndex)
    check(Prop.forAll(tsGen) { rows =>
      val df = rows.map { case (day, i) =>
        (i.toLong, new Timestamp(86400000L * day))
      }.toDF("id", "timestamp")
      val split = new Timestamp(86400000L * 100)
      val (train, test) = graft.operators.SilverTransform.chronoSplit(df, split)
      val n = df.count()
      train.count() + test.count() == n &&
        train.intersect(test).count() == 0 &&
        train.filter(col("timestamp") >= lit(split)).count() == 0
    }, cases = 4)
  }

  test("saltedAgg equals plain aggregation for any salt count") {
    // Decimal sums: salting reorders additions, which is only an identity
    // for exact monoids — double sums would drift in the last ulp (the
    // production query q_salted_agg uses the same decimal form).
    check(Prop.forAll(eventsGen, Gen.choose(1, 32)) { (rows, salts) =>
      val df = toDf(rows)
      val dec = col("value").cast("decimal(18,2)")
      val plain = df.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(dec).as("t"))
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val salted = Skew.saltedAgg(
        df, "user_id", col("event_id"), salts,
        counts = Seq("n" -> "*"), sums = Seq("t" -> dec))
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      plain == salted
    }, cases = 4)
  }

  test("text kernels equal their regex/HOF formulations on arbitrary strings") {
    import graft.functions.TextFunctions._
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B'),
      2 -> Gen.oneOf('.', ',', '!', '?', '(', ')', '[', ']', '@', '-'),
      2 -> Gen.oneOf('é', 'ü', '中', '文', 'я', '✓'),
      1 -> Gen.oneOf("the", "a", "of", "und", "le").flatMap(s => Gen.oneOf(s.toList)))
    val strGen = Gen.listOf(Gen.frequency(
      5 -> Gen.listOf(charGen).map(_.mkString),
      1 -> Gen.oneOf("", "   ", "the a of", " the\tof "))).map(_.take(60))
    check(Prop.forAll(strGen) { strs =>
      val df = strs.toDF("t")
      val rows = df.select(
        tokenCount(col("t")).as("k_tc"),
        size(tokens(col("t"))).as("r_tc"),
        punctCount(col("t")).as("k_pc"),
        size(regexp_extract_all(col("t"), lit(PunctClass), lit(0))).as("r_pc"),
        stopwordCount(col("t")).as("k_sw"),
        size(filter(tokens(lower(col("t"))),
          x => x.isin(Stopwords("en"): _*))).as("r_sw"),
        normalizeWhitespace(col("t")).as("k_nw"),
        trim(regexp_replace(lower(col("t")), lit("""\s+"""), lit(" "))).as("r_nw"),
        tokenStats(col("t")).as("k_ts"),
        aggregate(
          tokens(col("t")),
          struct(lit(0).as("n_tokens"), lit(0).as("total_len"), lit(0).as("n_stopwords")),
          (acc, tk) => struct(
            (acc.getField("n_tokens") + lit(1)).as("n_tokens"),
            (acc.getField("total_len") + length(tk)).as("total_len"),
            (acc.getField("n_stopwords") +
              when(lower(tk).isin(Stopwords("en"): _*), 1).otherwise(0))
              .as("n_stopwords"))).as("r_ts"))
        .collect()
      rows.forall { r =>
        r.getInt(0) == r.getInt(1) && r.getInt(2) == r.getInt(3) &&
          r.getInt(4) == r.getInt(5) && r.getString(6) == r.getString(7) &&
          r.getStruct(8) == r.getStruct(9)
      }
    }, cases = 5)
  }

  test("jaccard pairs are bounded and consistent with set sizes") {
    val docsGen = Gen.nonEmptyListOf(
      Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon"))
        .map(_.mkString(" "))).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    check(Prop.forAll(docsGen) { docs =>
      val out = Dedup.jaccardPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text", n = 3, minJaccard = 0.0)
        .collect()
      out.forall { r =>
        val j = r.getAs[Double]("jaccard")
        j > 0.0 && j <= 1.0 && r.getAs[Long]("n_common") >= 1L
      }
    }, cases = 3)
  }
}
