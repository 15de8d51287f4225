package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LabelMonitor

class LabelMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val root = s"target/tmp/labelmon_${System.nanoTime()}"

  /** Deterministic (slice, a, b) vote rows — seeded congruential hash
    * so runs replay bitwise.
    */
  private def votes(n: Int, seed: Int): Seq[(String, String, String)] =
    (0 until n).map { i =>
      val h = (i * 2654435761L + seed * 40503L) & 0x7fffffffL
      (s"b${i % 3}", (h % 2 == 0).toString, ((h / 7) % 2 == 0).toString)
    }

  test("kappaBySlice: per-slice kappa equals cohenKappa run on each slice alone") {
    val df = votes(300, 1).toDF("slice", "a", "b")
    val sliced = LabelMonitor.kappaBySlice(df, "slice", "a", "b")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), Option(r.get(4))))
      .toMap
    for (s <- Seq("b0", "b1", "b2")) {
      val one = graft.operators.MlEval.cohenKappa(
        df.filter(col("slice") === s), "a", "b").collect().head
      assert(sliced(s) ==
        ((one.getLong(0), one.getDouble(1), one.getDouble(2), Option(one.get(3)))),
        s"slice $s disagrees with the one-slice cohenKappa")
    }
  }

  test("label monitor: streamed state fold == one-shot batch, bit for bit") {
    // three "annotation runs" land as parquet files; the stream folds
    // each micro-batch's cell state into a running store (the
    // foreachBatch posture every incremental operator here uses), and
    // the finalized readout must equal the one-shot batch compute
    // exactly — counts are monoids, kappa is finalized at read.
    val runs = Seq(votes(200, 2), votes(150, 3), votes(250, 4))
    new java.io.File(s"$root/in").mkdirs()
    def land(i: Int): Unit =
      runs(i).toDF("slice", "a", "b").coalesce(1)
        .write.mode("append").parquet(s"$root/in")
    land(0)
    val schema = runs(0).toDF("slice", "a", "b").schema
    var store: Option[DataFrame] = None
    val stream = spark.readStream.schema(schema).parquet(s"$root/in")
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = LabelMonitor.cellState(batch, "slice", "a", "b")
          .localCheckpoint(true)
        store = Some(store.fold(delta)(s =>
          LabelMonitor.mergeCellState(s, delta).localCheckpoint(true)))
        ()
    }.start()
    try {
      q.processAllAvailable()
      land(1)
      q.processAllAvailable()
      land(2)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = LabelMonitor.kappaFromState(store.get)
      .orderBy("slice").collect().map(_.toSeq).toSeq
    val oneShot = LabelMonitor.kappaBySlice(
        runs.flatten.toDF("slice", "a", "b"), "slice", "a", "b")
      .orderBy("slice").collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == oneShot,
      "streamed fold must equal the batch compute bit for bit")
  }

  test("positionBySlice: merge == one-shot; the planted biased slice flags") {
    // slice p0: winner alternates sides while "x" is always first ->
    // 50% first-win, unbiased; slice p1: first always wins -> flagged
    val rows = (0 until 100).map(i =>
      ("p0", if (i % 2 == 0) "x" else "y", "x")) ++
      (0 until 100).map(_ => ("p1", "x", "x"))
    val df = rows.toDF("slice", "w", "f")
    val (ra, rb) = rows.splitAt(120)
    val merged = LabelMonitor.mergePositionState(
      LabelMonitor.positionState(ra.toDF("slice", "w", "f"), "slice", "w", "f"),
      LabelMonitor.positionState(rb.toDF("slice", "w", "f"), "slice", "w", "f"))
    val got = LabelMonitor.positionFromState(merged)
      .orderBy("slice").collect().map(_.toSeq).toSeq
    val oneShot = LabelMonitor.positionBySlice(df, "slice", "w", "f")
      .orderBy("slice").collect().map(_.toSeq).toSeq
    assert(got == oneShot, "merged position state must equal one-shot")
    val flags = got.map(s => s.head.toString -> s.last).toMap
    assert(flags("p0") == false && flags("p1") == true,
      s"only the planted slice should flag: $flags")
  }
}
