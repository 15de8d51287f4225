package graft

import graft.sources.{JdbcIO, TableIO}

class JdbcIOSpec extends SparkSpec {

  private lazy val url = JdbcIO.derbyUrl(s"target/tmp/derby/spec_${System.nanoTime()}")

  test("round-trip preserves every row and column, CLOB-mapped strings included") {
    val sup = TableIO.table(spark, Sf0001, "supplier")
    JdbcIO.write(sup, url, "supplier_rt")
    // overwrite mode drops and recreates — a second write is idempotent
    JdbcIO.write(sup, url, "supplier_rt")
    val back = JdbcIO.read(spark, url, "supplier_rt")
    val a = sup.orderBy("s_suppkey").collect().toSeq
    val b = back.select(sup.columns.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("s_suppkey").collect().toSeq
    assert(a == b)
  }

  test("filters and column pruning push into the remote query") {
    val sup = TableIO.table(spark, Sf0001, "supplier")
    JdbcIO.write(sup, url, "supplier_push")
    val df = JdbcIO.read(spark, url, "supplier_push")
      .filter(org.apache.spark.sql.functions.col("s_nationkey") > 10)
      .select("s_suppkey", "s_acctbal")
    val plan = df.queryExecution.executedPlan.toString
    // '*' marks a filter handled ENTIRELY by the source — Spark adds no
    // residual Filter node; the predicate runs inside the remote SELECT.
    assert(plan.contains("PushedFilters: [*IsNotNull(s_nationkey), *GreaterThan(s_nationkey,10)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<s_suppkey:bigint,s_acctbal:double>"),
      s"columns not pruned:\n$plan")
  }

  test("partitioned read slices into N tasks and loses no rows at the bounds") {
    val sup = TableIO.table(spark, Sf0001, "supplier")
    JdbcIO.write(sup, url, "supplier_part")
    // Bounds are interior on purpose: rows below lower / above upper must
    // still arrive via the unbounded first/last slices.
    val part = JdbcIO.readPartitioned(
      spark, url, "supplier_part", "s_suppkey",
      lowerBound = 3L, upperBound = 7L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == sup.count())
    val a = sup.select("s_suppkey").orderBy("s_suppkey").collect().toSeq
    val b = part.select("s_suppkey").orderBy("s_suppkey").collect().toSeq
    assert(a == b)
  }
}
