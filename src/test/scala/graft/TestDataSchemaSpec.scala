package graft

import graft.sources.{TableIO, TestDataSchema}

/** Fixture-drift tripwire (named `A...` lexicographic ordering is NOT
  * relied on — any run order works; this suite just guarantees the drift
  * shows up as ONE diff-shaped failure, whatever else fails with it).
  */
class TestDataSchemaSpec extends SparkSpec {

  test("driver testdata schemas match TESTDATA.md expectations (sf0.001)") {
    val d = TestDataSchema.drift(spark, Sf0001)
    assert(d.isEmpty, "\nTESTDATA SCHEMA DRIFT:\n  " + d.mkString("\n  "))
  }

  test("a mis-typed fixture produces one clear finding, not a crash") {
    // Events with ts as plain string: normalizeEventTs casts it to
    // TIMESTAMP, so the tripwire passes ts but the deliberately broken
    // value column must surface as exactly one readable finding.
    import org.apache.spark.sql.functions.col
    val broken = TableIO.table(spark, Sf0001, "events")
      .withColumn("value", col("value").cast("string"))
    val tmp = java.nio.file.Files.createTempDirectory("schema_trip").toString
    broken.limit(10).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    TestDataSchema.expected.filterNot(_._1 == "events").foreach { case (t, _) =>
      TableIO.table(spark, Sf0001, t).limit(1).write.mode("overwrite")
        .parquet(s"$tmp/$t.parquet")
    }
    val d = TestDataSchema.drift(spark, tmp)
    assert(d.size == 1 && d.head.contains("events.value") &&
      d.head.contains("STRING") && d.head.contains("DOUBLE"), d.mkString("; "))
  }
}
