package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Upsert

/** Streaming CDC ingestion: an unbounded Debezium-shaped changelog
  * (row payload + op + seq) maintains a queryable
  * [[Upsert.writeKeyedTable]] store. Each micro-batch first collapses
  * to latest-seq-per-key ([[graft.operators.Cdc.applyChangelog]]'s
  * within-batch rule, run over the DELTA only), then applies as ONE
  * partition-scoped copy-on-write pass ([[Upsert.applyKeyed]]): the
  * winning upserts replace/insert, the winning deletes remove, and
  * only manifest-matched partitions rewrite. The store is a plain
  * parquet table the whole batch engine can read mid-stream.
  *
  * Ordering contract: WITHIN a batch, seq resolves conflicts exactly
  * like the batch operator. ACROSS batches, per-key arrival order
  * must follow log order — the guarantee a Kafka-partitioned CDC feed
  * provides per key. (A cross-batch regression guard would need the
  * stored seq compared on merge; the seq column IS kept in the store
  * so consumers and audits can detect out-of-order application.)
  *
  * Replay: foreachBatch re-delivers the last uncommitted batch after
  * a crash. Re-applying it converges — the same winning rows replace
  * themselves and the same deletes find nothing — so the store is
  * correct under at-least-once delivery (spec-pinned).
  */
object CdcIngest {

  /** Collapse one changelog batch to its winning rows: one row per
    * key, highest seq. Exposed for the spec and the batch twin.
    */
  def latestPerKey(changes: DataFrame, keyCol: String, seqCol: String): DataFrame =
    changes
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Apply one collapsed batch to the store. Factored out of the
    * stream so replay/crash tests and the stream share one body.
    */
  def applyBatch(
      batch: DataFrame,
      storeDir: String,
      partitionCol: String,
      keyCol: String,
      seqCol: String,
      opCol: String): Unit = {
    if (batch.isEmpty) return
    val latest = latestPerKey(batch, keyCol, seqCol).localCheckpoint(true)
    val upserts = latest.filter(lower(col(opCol)) =!= "delete").drop(opCol)
    val dels = latest.filter(lower(col(opCol)) === "delete").select(col(keyCol))
    Upsert.applyKeyed(
      batch.sparkSession, storeDir, partitionCol, keyCol, upserts, dels)
    ()
  }

  /** Start the ingestion stream. The store must exist
    * ([[Upsert.writeKeyedTable]] an initial snapshot first — possibly
    * empty but schema-bearing). The stored schema is the changelog's
    * minus `opCol` (seq kept, see ordering contract above).
    */
  def applyChangelogStream(
      changes: DataFrame,
      storeDir: String,
      partitionCol: String,
      keyCol: String,
      seqCol: String,
      opCol: String,
      checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(batch, storeDir, partitionCol, keyCol, seqCol, opCol)
      }
      .start()
}
