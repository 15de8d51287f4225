package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Upsert

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"target/tmp/upsert_spec_$tag"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    d
  }

  private def base = Seq(
    (1L, 2020, "a", 10.0), (2L, 2020, "b", 20.0), (3L, 2021, "c", 30.0),
    (4L, 2021, "d", 40.0), (5L, 2022, "e", 50.0)
  ).toDF("id", "yr", "name", "v")

  test("merge replaces matched rows wholesale and inserts unmatched") {
    val updates = Seq((2L, 2020, "B2", 21.0), (9L, 2022, "new", 99.0))
      .toDF("id", "yr", "name", "v")
    val got = Upsert.merge(base, updates, Seq("id"))
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(3)))).toMap
    assert(got.size == 6)
    assert(got(2L) == ("B2", 21.0))
    assert(got(9L) == ("new", 99.0))
    assert(got(1L) == ("a", 10.0))
  }

  test("merge aligns update column order to the target schema") {
    val updates = Seq(("z", 5L, 51.5, 2022)).toDF("name", "id", "v", "yr")
    val got = Upsert.merge(base, updates, Seq("id"))
    assert(got.columns.toSeq == base.columns.toSeq)
    val r5 = got.filter(col("id") === 5L).collect().head
    assert(r5.getString(2) == "z" && r5.getDouble(3) == 51.5)
  }

  test("mergeWithDelete drops matched rows flagged for delete; unmatched deletes are no-ops") {
    val updates = Seq(
      (2L, 2020, "B2", 21.0, false),  // update
      (3L, 2021, "c", 0.0, true),     // delete matched
      (7L, 2022, "x", 1.0, true),     // delete unmatched -> no-op
      (9L, 2022, "new", 99.0, false)  // insert
    ).toDF("id", "yr", "name", "v", "del")
    val got = Upsert.mergeWithDelete(base, updates, Seq("id"), col("del"))
    assert(!got.columns.contains("__del"))
    val ids = got.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L, 5L, 9L))
  }

  test("requireUniqueKeys rejects a duplicate-key batch, passes a unique one") {
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "x")
    intercept[IllegalArgumentException] {
      Upsert.requireUniqueKeys(dup, Seq("id"))
    }
    Upsert.requireUniqueKeys(dup.dropDuplicates("id"), Seq("id"))
  }

  test("upsertPartitioned matches merge semantics and rewrites only affected partitions") {
    val dir = freshDir("cow")
    Upsert.writeKeyedTable(base, dir, "yr", "id")

    // 2022's parquet file must be untouched by an update batch that
    // only touches 2020 (matched key 2) and 2021 (insert id 6).
    def files(yr: Int) = {
      val d = Paths.get(s"$dir/data/yr=$yr")
      if (!Files.exists(d)) Map.empty[String, Long]
      else {
        val s = Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis)
            .toMap
        } finally s.close()
      }
    }
    val before2022 = files(2022)
    assert(before2022.nonEmpty)

    val updates = Seq((2L, 2020, "B2", 21.0), (6L, 2021, "f", 60.0))
      .toDF("id", "yr", "name", "v")
    val rewritten = Upsert.upsertPartitioned(spark, dir, "yr", "id", updates)
    assert(rewritten == 2)
    assert(files(2022) == before2022, "unaffected partition files were rewritten")

    val got = Upsert.readKeyedTable(spark, dir)
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        r.getDouble(r.fieldIndex("v"))).toMap
    val want = Upsert.merge(base, updates, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == want)

    // Manifest reflects the store exactly.
    val m = spark.read.parquet(s"$dir/manifest")
      .collect().map(r => r.getInt(r.fieldIndex("yr")) ->
        ((r.getLong(r.fieldIndex("first_key")), r.getLong(r.fieldIndex("last_key")),
          r.getLong(r.fieldIndex("n_rows"))))).toMap
    assert(m == Map(2020 -> ((1L, 2L, 2L)), 2021 -> ((3L, 6L, 3L)), 2022 -> ((5L, 5L, 1L))))
  }

  test("partition-mover relocates the row and drains emptied source partitions") {
    val dir = freshDir("mover")
    Upsert.writeKeyedTable(base, dir, "yr", "id")
    // id=5 is 2022's only row; move it to 2020.
    val updates = Seq((5L, 2020, "e2", 55.0)).toDF("id", "yr", "name", "v")
    val rewritten = Upsert.upsertPartitioned(spark, dir, "yr", "id", updates)
    assert(rewritten == 2) // source 2022 + destination 2020
    assert(!Files.exists(Paths.get(s"$dir/data/yr=2022")), "drained partition dir not removed")
    val got = Upsert.readKeyedTable(spark, dir)
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        ((r.getInt(r.fieldIndex("yr")), r.getString(r.fieldIndex("name"))))).toMap
    assert(got(5L) == ((2020, "e2")) && got.size == 5)
    val mYears = spark.read.parquet(s"$dir/manifest")
      .select("yr").as[Int].collect().toSet
    assert(mYears == Set(2020, 2021), "manifest row for drained partition must go")
  }

  test("upsert is idempotent under replay and empty batches are free") {
    val dir = freshDir("replay")
    Upsert.writeKeyedTable(base, dir, "yr", "id")
    val updates = Seq((2L, 2020, "B2", 21.0), (9L, 2022, "new", 99.0))
      .toDF("id", "yr", "name", "v")
    Upsert.upsertPartitioned(spark, dir, "yr", "id", updates)
    val once = Upsert.readKeyedTable(spark, dir).orderBy("id")
      .collect().map(_.toSeq).toSeq
    Upsert.upsertPartitioned(spark, dir, "yr", "id", updates)
    val twice = Upsert.readKeyedTable(spark, dir).orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(once == twice)
    assert(Upsert.upsertPartitioned(spark, dir, "yr", "id",
      updates.filter(col("id") < 0)) == 0)
  }

  test("10k-row update batch applies without plan blowup") {
    val dir = freshDir("batch10k")
    val big = spark.range(0, 30000)
      .select(col("id"), (col("id") % 10).cast("int").as("yr"),
        concat(lit("n"), col("id")).as("name"), col("id").cast("double").as("v"))
    Upsert.writeKeyedTable(big, dir, "yr", "id")
    val updates = spark.range(0, 10000)
      .select((col("id") * 3).as("id"), ((col("id") * 3) % 10).cast("int").as("yr"),
        lit("upd").as("name"), lit(-1.0).as("v"))
    val t0 = System.nanoTime()
    Upsert.upsertPartitioned(spark, dir, "yr", "id", updates)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, f"10k-id upsert took $secs%.1f s — plan blowup?")
    val got = Upsert.readKeyedTable(spark, dir)
    assert(got.count() == 30000)
    assert(got.filter(col("name") === "upd").count() == 10000)
    assert(got.filter(col("v") === -1.0).agg(sum("id")).as[Long].head() ==
      (0L until 10000L).map(_ * 3).sum)
  }
}
