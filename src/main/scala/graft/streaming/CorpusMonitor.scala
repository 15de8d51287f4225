package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.GopherRules

/** Streaming CORPUS QUALITY MONITOR — the observability half of the
  * streaming ingestion arms: one (batch_id, source) summary row-set per
  * micro-batch, appended to a delta-partitioned monitoring table. A
  * curation dashboard tails this table to catch a feed going bad (a
  * source's pass_frac collapsing, token volume spiking) WITHOUT
  * touching the corpus data itself — the monitor holds only
  * per-source aggregates, so it stays KBs per batch at any corpus
  * scale.
  *
  * Row contents per (batch_id, source): doc/token volume, mean
  * composite quality, and the full Gopher per-rule failure breakdown
  * ([[GopherRules.rollup]] — "batch 374's src3 went 40% bullet-rule
  * failures" is a scraper regression caught in one table read).
  *
  * Replay-safe like every delta store in the engine: each batch
  * OVERWRITES its deterministic `delta=<batchId>` dir, so a Structured
  * Streaming replay rewrites identical bytes instead of duplicating
  * monitor rows.
  */
object CorpusMonitor {

  /** The batch-form monitor frame: per-source volume + quality + rule
    * breakdown. Shared by the sink and directly usable batch-side.
    */
  def monitorFrame(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String): DataFrame = {
    val volume = batch.groupBy(col(sourceCol).as("source"))
      .agg(
        sum(graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long"))
          .as("total_tokens"),
        round(avg(graft.functions.TextFunctions.qualityScore(col(textCol))), 6)
          .as("mean_quality"))
    GopherRules.rollup(
        GopherRules.signals(batch, idCol, textCol), batch, idCol, sourceCol)
      .join(volume, Seq("source"))
  }

  def appendBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      path: String,
      batchId: Long): Unit = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    monitorFrame(batch, idCol, textCol, sourceCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/delta=$batchId")
  }

  def readMonitor(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("delta")

  def monitorSink(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        appendBatch(batch.toDF(), idCol, textCol, sourceCol, path, id)
      }
      .start()
}
