package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"target/tmp/vtable_$tag"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    d
  }

  test("append commits accumulate; every version stays readable (time travel)") {
    val dir = freshDir("append")
    assert(VersionedTable.latestVersion(spark, dir) == 0)
    val v1 = VersionedTable.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "x"))
    val v2 = VersionedTable.commit(spark, dir, Seq((3L, "c")).toDF("id", "x"))
    assert((v1, v2) == ((1, 2)))
    assert(VersionedTable.read(spark, dir, 1).count() == 2)
    assert(VersionedTable.read(spark, dir, 2).count() == 3)
    assert(VersionedTable.read(spark, dir).select(sum("id")).as[Long].head() == 6L)
  }

  test("overwrite resets contents logically; parent versions still read their files") {
    val dir = freshDir("ow")
    VersionedTable.commit(spark, dir, Seq((1L, "a")).toDF("id", "x"))
    VersionedTable.commit(spark, dir, Seq((2L, "b")).toDF("id", "x"))
    val v3 = VersionedTable.commit(spark, dir, Seq((9L, "z")).toDF("id", "x"), overwrite = true)
    assert(v3 == 3)
    assert(VersionedTable.read(spark, dir, 2).count() == 2)
    assert(VersionedTable.read(spark, dir, 3).select("id").as[Long].collect().toSeq == Seq(9L))
    val hist = VersionedTable.history(spark, dir)
    assert(hist.map(h => (h._1, h._2)) == Seq((1, 1), (2, 2), (3, 1)))
  }

  test("a crashed writer (staged files, no manifest) is invisible; vacuum cleans it") {
    val dir = freshDir("crash")
    VersionedTable.commit(spark, dir, Seq((1L, "a")).toDF("id", "x"))
    // Simulate a writer that died after staging data, before manifest.
    Seq((99L, "dead")).toDF("id", "x")
      .write.parquet(s"$dir/_stage_deadbeef")
    assert(VersionedTable.latestVersion(spark, dir) == 1)
    assert(VersionedTable.read(spark, dir).count() == 1)
    VersionedTable.vacuum(spark, dir, keepFrom = 1)
    assert(!Files.exists(Paths.get(s"$dir/_stage_deadbeef")))
    assert(VersionedTable.read(spark, dir).count() == 1)
  }

  test("vacuum drops pre-keepFrom versions and their unreferenced files only") {
    val dir = freshDir("vacuum")
    VersionedTable.commit(spark, dir, Seq((1L, "a")).toDF("id", "x"))
    VersionedTable.commit(spark, dir, Seq((2L, "b")).toDF("id", "x"))            // v2 carries v1
    VersionedTable.commit(spark, dir, Seq((9L, "z")).toDF("id", "x"), overwrite = true) // v3 orphans v1+v2 files
    VersionedTable.commit(spark, dir, Seq((10L, "w")).toDF("id", "x"))           // v4 carries v3
    VersionedTable.vacuum(spark, dir, keepFrom = 3)
    intercept[IllegalArgumentException] { VersionedTable.read(spark, dir, 2) }
    assert(VersionedTable.read(spark, dir, 3).count() == 1)
    assert(VersionedTable.read(spark, dir, 4).count() == 2)
    // v1/v2's data files (only ever referenced below keepFrom) are gone.
    val files = Files.list(Paths.get(s"$dir/files"))
    try {
      import scala.jdk.CollectionConverters._
      val names = files.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).filterNot(_.startsWith(".")).toSet
      assert(names.forall(n => n.startsWith("v3-") || n.startsWith("v4-")), names.toString)
    } finally files.close()
  }

  test("concurrent commits serialize through the CAS: unique versions, no lost rows") {
    val dir = freshDir("race")
    VersionedTable.commit(spark, dir, Seq((0L, "seed")).toDF("id", "x"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val racers = (1 to 4).map { i =>
      Future(VersionedTable.commit(spark, dir, Seq((i.toLong, s"r$i")).toDF("id", "x")))
    }
    val versions = Await.result(Future.sequence(racers), 120.seconds)
    assert(versions.sorted == Seq(2, 3, 4, 5), versions.toString)
    // Head version sees the seed plus all four racers, exactly once each.
    val ids = VersionedTable.read(spark, dir, 5).select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("schema contract: mismatched append fails; mergeSchema evolves with nulls") {
    val dir = freshDir("schema_merge")
    VersionedTable.commit(spark, dir, Seq((1L, "a")).toDF("id", "x"))
    // shape drift without the flag: loud, names the flag
    val err = intercept[IllegalArgumentException] {
      VersionedTable.commit(spark, dir, Seq((2L, "b", 7)).toDF("id", "x", "n"))
    }
    assert(err.getMessage.contains("mergeSchema"))
    // evolve: new column appends; v1's rows read as null there
    VersionedTable.commit(spark, dir,
      Seq((2L, "b", 7)).toDF("id", "x", "n"), mergeSchema = true)
    val latest = VersionedTable.read(spark, dir).orderBy("id")
    assert(latest.columns.toSeq == Seq("id", "x", "n"))
    assert(latest.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq ==
      Seq((1L, "a", None), (2L, "b", Some(7))))
    // time travel: v1 reads under ITS recorded schema
    assert(VersionedTable.read(spark, dir, 1).columns.toSeq == Seq("id", "x"))
    // a shared name cannot change type, even under mergeSchema
    val tErr = intercept[IllegalArgumentException] {
      VersionedTable.commit(spark, dir,
        Seq((3L, 5, 1)).toDF("id", "x", "n"), mergeSchema = true)
    }
    assert(tErr.getMessage.contains("cannot change the type"))
  }

  test("schema contract: overwrite with a new schema needs overwriteSchema") {
    val dir = freshDir("schema_over")
    VersionedTable.commit(spark, dir, Seq((1L, "a")).toDF("id", "x"))
    val err = intercept[IllegalArgumentException] {
      VersionedTable.commit(spark, dir,
        Seq((9L, 1.5)).toDF("id", "score"), overwrite = true)
    }
    assert(err.getMessage.contains("overwriteSchema"))
    VersionedTable.commit(spark, dir,
      Seq((9L, 1.5)).toDF("id", "score"), overwrite = true, overwriteSchema = true)
    assert(VersionedTable.read(spark, dir).columns.toSeq == Seq("id", "score"))
    assert(VersionedTable.read(spark, dir, 1).columns.toSeq == Seq("id", "x"))
    // identical-shape overwrite still needs no flag
    VersionedTable.commit(spark, dir,
      Seq((10L, 2.5)).toDF("id", "score"), overwrite = true)
    assert(VersionedTable.latestVersion(spark, dir) == 3)
  }

  test("legacy manifests without a schema record still read") {
    val dir = freshDir("schema_legacy")
    VersionedTable.commit(spark, dir, Seq((1L, "a")).toDF("id", "x"))
    // strip the header line, simulating a pre-record manifest
    val m = Paths.get(s"$dir/_manifests/v1")
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(m)).asScala.filterNot(_.startsWith("#"))
    Files.write(m, (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    assert(VersionedTable.readSchema(spark, dir, 1).isEmpty)
    assert(VersionedTable.read(spark, dir).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // and the NEXT commit (no parent record) proceeds without enforcement
    VersionedTable.commit(spark, dir, Seq((2L, "b", 7)).toDF("id", "x", "n"))
    assert(VersionedTable.latestVersion(spark, dir) == 2)
  }

  test("reading an uncommitted or empty version fails loudly") {
    val dir = freshDir("empty")
    intercept[IllegalArgumentException] { VersionedTable.read(spark, dir) }
    VersionedTable.commit(spark, dir, Seq((1L, "a")).toDF("id", "x"))
    intercept[IllegalArgumentException] { VersionedTable.read(spark, dir, 7) }
  }
}
