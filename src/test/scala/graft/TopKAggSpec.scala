package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKAgg
import graft.sources.TableIO

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKAgg.topKByValue(col("v"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("g"), (col("i") + 1).cast("int").as("rnk"),
        col("e.id").as("id"), col("e.value").as("v"))

  test("matches the rank-window form on real data") {
    val orders = TableIO.table(spark, Sf0001, "orders")
      .select(col("o_custkey").as("g"), col("o_orderkey").as("id"), col("o_totalprice").as("v"))
    val agg = viaAgg(orders, 3).orderBy("g", "rnk").collect().toSeq
    val w = Window.partitionBy("g").orderBy(desc("v"), asc("id"))
    val win = orders
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("g", "rnk", "id", "v")
      .orderBy("g", "rnk").collect().toSeq
    assert(agg == win)
  }

  test("ties break on id ascending; boundary at k is deterministic") {
    val df = Seq((1L, 10L, 5.0), (1L, 12L, 5.0), (1L, 11L, 5.0), (1L, 13L, 4.0))
      .toDF("g", "id", "v")
    val got = viaAgg(df, 2).orderBy("rnk")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L))
  }

  test("k larger than the group returns the whole group, sorted") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 3.0)).toDF("g", "id", "v")
    val got = viaAgg(df, 10).orderBy("rnk")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L, 1L))
  }

  test("null values and ids are skipped") {
    val df = Seq(
      (1L, Some(1L), Some(2.0)), (1L, Some(2L), None),
      (1L, None, Some(9.0)), (1L, Some(3L), Some(1.0)))
      .toDF("g", "id", "v")
    val got = viaAgg(df, 5).orderBy("rnk")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L))
  }

  test("NaN sorts as the largest value, matching the rank-window oracle") {
    val df = Seq(
      (1L, 1L, 5.0), (1L, 2L, Double.NaN), (1L, 3L, 7.0),
      (1L, 4L, Double.NaN), (1L, 5L, 1.0),
      (2L, 6L, Double.NaN), (2L, 7L, 2.0))
      .toDF("g", "id", "v")
    // Spark orders NaN as larger than any double: desc puts NaN first.
    val w = Window.partitionBy("g").orderBy(desc("v"), asc("id"))
    val win = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .select("g", "rnk", "id")
      .orderBy("g", "rnk").collect().toSeq
    // Exercise both the single-partition and the merge path.
    val one = viaAgg(df.coalesce(1), 2).select("g", "rnk", "id")
      .orderBy("g", "rnk").collect().toSeq
    val many = viaAgg(df.repartition(7), 2).select("g", "rnk", "id")
      .orderBy("g", "rnk").collect().toSeq
    assert(one == win)
    assert(many == win)
  }

  test("float value and int id columns coerce at analysis time") {
    val df = Seq((1, 10, 2.5f), (1, 11, 9.5f), (1, 12, 4.0f))
      .toDF("g", "id", "v")
      .select(col("g"), col("id").cast("int").as("id"), col("v").cast("float").as("v"))
    val got = viaAgg(df, 2).orderBy("rnk")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(11L, 12L))
  }

  test("partial-aggregation merge path gives identical results") {
    val rng = new scala.util.Random(3L)
    val rows = (0 until 5000).map(i => (i % 17L, i.toLong, rng.nextInt(100).toDouble))
    val df = rows.toDF("g", "id", "v")
    val one = viaAgg(df.coalesce(1), 4).orderBy("g", "rnk").collect().toSeq
    val many = viaAgg(df.repartition(13), 4).orderBy("g", "rnk").collect().toSeq
    assert(one == many)
  }

  private def viaVarAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g"))
      .agg(TopKAgg.topKByValueVarK(col("v"), col("id"), col("k")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("g"), (col("i") + 1).cast("int").as("rnk"),
        col("e.id").as("id"), col("e.value").as("v"))

  test("var-k form: each group honors its own k, matches fixed-k per group") {
    val rng = new scala.util.Random(7L)
    val rows = (0 until 3000).map(i => (i % 5L, i.toLong, rng.nextInt(1000).toDouble))
    // k per group: group g wants g*2 + 1 winners (1, 3, 5, 7, 9).
    val df = rows.toDF("g", "id", "v").withColumn("k", (col("g") * 2 + 1).cast("int"))
    val got = viaVarAgg(df.repartition(13)).orderBy("g", "rnk").collect().toSeq
    val expected = (0L until 5L).flatMap { g =>
      viaAgg(df.filter(col("g") === g), (g * 2 + 1).toInt)
        .orderBy("rnk").collect().toSeq
    }
    assert(got == expected)
  }

  test("var-k form: ties break on id ascending, same rule as fixed-k") {
    val df = Seq(
      (1L, 10L, 5.0, 2), (1L, 12L, 5.0, 2), (1L, 11L, 5.0, 2), (1L, 13L, 4.0, 2),
      (2L, 20L, 7.0, 1), (2L, 21L, 7.0, 1))
      .toDF("g", "id", "v", "k")
    val got = viaVarAgg(df.repartition(5)).orderBy("g", "rnk")
      .select("g", "id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 20L)))
  }

  test("var-k form: k <= 0 or null rows are ignored; all-nonpositive group is empty") {
    val df = Seq(
      (1L, 1L, 5.0, Some(2)), (1L, 2L, 9.0, Some(2)), (1L, 3L, 7.0, Some(2)),
      (2L, 4L, 1.0, Some(0)), (2L, 5L, 2.0, None))
      .toDF("g", "id", "v", "k")
    val got = viaVarAgg(df).select("g", "id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L)))
  }
}
