package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting is an algebraic rewrite: salted results must equal unsalted
  * results exactly, for any salt count, including skewed inputs.
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  private def skewed = {
    // key 1 holds 90% of rows — the straggler shape.
    val rows = (1 to 900).map(i => (1L, i.toLong, i * 0.5)) ++
      (1 to 100).map(i => ((i % 10 + 2).toLong, i.toLong, i * 2.0))
    rows.toDF("k", "row_id", "v")
  }

  test("saltedAgg equals plain groupBy for counts and sums") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .orderBy("k").collect()
    val salted = Skew.saltedAgg(
      skewed, "k", col("row_id"), numSalts = 8,
      counts = Seq("n" -> "*"), sums = Seq("total" -> col("v")))
      .orderBy("k").collect()
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("skewedEquiJoin equals plain inner join on skewed keys") {
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (11L, "c")).toDF("dk", "name")
    val plain = skewed.join(dim, col("k") === col("dk"))
      .select("k", "row_id", "name").orderBy("k", "row_id").collect()
    val heavy = Skew.heavyHitters(skewed, "k", topK = 1)
    assert(heavy == Seq(1L))
    val salted = Skew.skewedEquiJoin(skewed, dim, "k", "dk", heavy, 8, col("row_id"))
      .select("k", "row_id", "name").orderBy("k", "row_id").collect()
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("skewedEquiJoin spreads a hot key over multiple shuffle partitions") {
    val dim = Seq((1L, "hot")).toDF("dk", "name")
    val salted = skewed.withColumn(
      "__salt", when(col("k").isin(1L), pmod(hash(col("row_id")), lit(8))).otherwise(lit(0)))
    val nSalts = salted.filter(col("k") === 1L).select("__salt").distinct().count()
    assert(nSalts > 1, "hot key should fan out over >1 salt value")
  }
}
