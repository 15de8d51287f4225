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

  test("null accounting: n_rows - count(col) lands in n_nulls") {
    val df = spark.range(100).toDF("id")
      .withColumn("x", when(col("id") % 4 === 0, col("id")))
    val p = byColumn(Profile.profile(df, exactDistinct = true))
    assert(p("x").getAs[Long]("n_nulls") == 75L)
    assert(p("x").getAs[Long]("n_rows") == 100L)
    assert(p("id").getAs[Long]("n_nulls") == 0L)
  }
}
