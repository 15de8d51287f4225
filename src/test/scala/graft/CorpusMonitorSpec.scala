package graft

import org.apache.spark.sql.functions._

import graft.streaming.CorpusMonitor

class CorpusMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    (1 to 10).map(_ => "the quick brown fox and that dog have fun").mkString(" ")
  private val bullets =
    (1 to 60).map(_ => "- the item and that thing is here now ok").mkString("\n")

  test("monitorFrame: per-source volume, quality and rule breakdown in one table") {
    val batch = Seq(
      (1L, "a", good), (2L, "a", good),
      (3L, "b", bullets)).toDF("doc_id", "source", "text")
    val got = CorpusMonitor.monitorFrame(batch, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(got("a").getAs[Long]("n_docs") == 2L)
    assert(got("a").getAs[Double]("pass_frac") == 1.0)
    assert(got("a").getAs[Long]("total_tokens") == 180L)
    assert(got("b").getAs[Double]("fail_bullet") == 1.0)
    assert(got("b").getAs[Double]("pass_frac") == 0.0)
    assert(got("a").getAs[Double]("mean_quality") > 0.5)
  }

  test("streamed monitor: one row-set per batch, replay rewrites not duplicates") {
    val root = s"target/tmp/monitor_${System.nanoTime()}"
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def feed(i: Int, rows: Seq[(Long, String, String)]): Unit = {
      val stage = s"$root/stage$i"
      rows.toDF("doc_id", "source", "text").coalesce(1).write.parquet(stage)
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(f, java.nio.file.Paths.get(s"$in/b$i.parquet"))
    }
    feed(0, Seq((1L, "a", good)))
    val schema = spark.read.parquet(in).schema
    val q = CorpusMonitor.monitorSink(
      spark.readStream.schema(schema).parquet(in),
      "doc_id", "text", "source", s"$root/monitor", s"$root/ckpt")
    q.processAllAvailable()
    feed(1, Seq((2L, "a", good), (3L, "b", bullets)))
    q.processAllAvailable()
    q.stop()

    val monitor = CorpusMonitor.readMonitor(spark, s"$root/monitor")
    val byBatch = monitor.groupBy("batch_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBatch == Map(0L -> 1L, 1L -> 2L),
      s"one row per (batch, source): $byBatch")

    // replaying batch 1 overwrites its delta — row counts unchanged
    CorpusMonitor.appendBatch(
      Seq((2L, "a", good), (3L, "b", bullets)).toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", s"$root/monitor", 1L)
    assert(CorpusMonitor.readMonitor(spark, s"$root/monitor").count() == 3L)
    // and the monitor never stores document text
    assert(!monitor.columns.contains("text"))
  }
}
