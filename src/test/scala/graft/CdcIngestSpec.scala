package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.{Cdc, Upsert}
import graft.streaming.CdcIngest

class CdcIngestSpec extends SparkSpec {
  import spark.implicits._

  private val root = s"target/tmp/cdc_ingest_${System.nanoTime()}"

  // (id, part, payload, seq, op)
  private type Change = (Long, Int, String, Long, String)

  private def changeDf(rows: Seq[Change]): DataFrame =
    rows.toDF("id", "part", "payload", "seq", "op")

  private def snapshot = Seq(
    (1L, 0, "a", 0L), (2L, 0, "b", 0L), (3L, 1, "c", 0L), (4L, 1, "d", 0L)
  ).toDF("id", "part", "payload", "seq")

  private val log1: Seq[Change] = Seq(
    (2L, 0, "b-old", 10L, "upsert"),
    (2L, 0, "b1", 11L, "upsert"),   // within-batch winner for key 2
    (5L, 1, "e", 10L, "upsert"))    // insert
  private val log2: Seq[Change] = Seq(
    (3L, 1, "x", 20L, "delete"),    // delete key 3
    (5L, 0, "e2", 21L, "upsert"),   // partition-mover 1 -> 0
    (6L, 0, "f-dead", 22L, "delete"),
    (6L, 0, "f", 23L, "upsert"))    // delete-then-insert resolves to insert

  private def readStore(dir: String) =
    Upsert.readKeyedTable(spark, dir)
      .select("id", "part", "payload", "seq")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap

  test("streamed changelog application equals the batch twin over the full log") {
    val store = s"$root/store1"
    Upsert.writeKeyedTable(snapshot, store, "part", "id")

    val in = s"$root/in1"
    Files.createDirectories(Paths.get(in))
    def land(name: String, rows: Seq[Change]): Unit = {
      changeDf(rows).coalesce(1).write.parquet(s"$root/stage_$name")
      val src = Files.list(Paths.get(s"$root/stage_$name"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.move(src, Paths.get(s"$in/$name.parquet"))
    }
    land("b0", log1)
    val schema: StructType = changeDf(Nil).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = CdcIngest.applyChangelogStream(
      stream, store, "part", "id", "seq", "op", s"$root/ckpt1")
    try {
      q.processAllAvailable()
      land("b1", log2)
      q.processAllAvailable()
    } finally q.stop()

    val got = readStore(store)
    // Batch twin: one applyChangelog over the whole log (per-key seq is
    // monotone across batches, as the ordering contract requires).
    val want = Cdc.applyChangelog(snapshot, changeDf(log1 ++ log2), "id", "seq", "op")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(got == want)
    assert(got == Map(
      1L -> ((0, "a")), 2L -> ((0, "b1")), 4L -> ((1, "d")),
      5L -> ((0, "e2")), 6L -> ((0, "f"))))
  }

  test("replaying the last batch converges (at-least-once safety)") {
    val store = s"$root/store2"
    Upsert.writeKeyedTable(snapshot, store, "part", "id")
    CdcIngest.applyBatch(changeDf(log1), store, "part", "id", "seq", "op")
    CdcIngest.applyBatch(changeDf(log2), store, "part", "id", "seq", "op")
    val once = readStore(store)
    CdcIngest.applyBatch(changeDf(log2), store, "part", "id", "seq", "op")
    assert(readStore(store) == once)
  }

  test("a batch touching one partition leaves the other partition's files alone") {
    val store = s"$root/store3"
    Upsert.writeKeyedTable(snapshot, store, "part", "id")
    def files(p: Int) = {
      val d = Paths.get(s"$store/data/part=$p")
      val s = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f).toMillis).toMap
      } finally s.close()
    }
    val before = files(1)
    CdcIngest.applyBatch(
      changeDf(Seq((2L, 0, "b9", 30L, "upsert"))), store, "part", "id", "seq", "op")
    assert(files(1) == before, "partition 1 should be untouched")
    assert(readStore(store)(2L) == ((0, "b9")))
  }

  test("an all-delete batch shrinks the store and drains emptied partitions") {
    val store = s"$root/store4"
    Upsert.writeKeyedTable(snapshot, store, "part", "id")
    CdcIngest.applyBatch(
      changeDf(Seq((3L, 1, "", 40L, "delete"), (4L, 1, "", 41L, "delete"))),
      store, "part", "id", "seq", "op")
    val got = readStore(store)
    assert(got.keySet == Set(1L, 2L))
    assert(!Files.exists(Paths.get(s"$store/data/part=1")), "drained partition removed")
  }
}
