package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Standing EXACTLY-k uniform sample over an unbounded row stream — the
  * incremental/streaming twin of [[TrainingData.exactSample]]: the
  * winners of the (id, salt) md5 race over EVERYTHING ingested so far,
  * folded one batch at a time with k rows of state.
  *
  * Why the fold is exact: the race key is a pure function of
  * (id, salt), so the k smallest keys of b0 ∪ ... ∪ bn are the k
  * smallest of (standing winners ∪ bn) — the fold is associative with
  * the standing state AS the sample, the same invariant that makes
  * [[TrainingData.exactSample]] append-stable. Fold == one-shot is
  * oracled (`q_sample_incr` replays ORDER BY md5-prefix LIMIT k over
  * the full corpus) and spec-pinned across arbitrary batch splits.
  *
  * Durability: state lives under `path` with the house swap discipline
  * ([[graft.streaming.StreamingFeatures.recoverSwap]] before every
  * touch; rename-aside, never delete-then-rename) plus the fold
  * watermark — a replay of a batch id at or below the marker is
  * skipped. The fold is idempotent even WITHOUT the marker
  * (re-racing rows the state already holds changes nothing after the
  * id-dedup); the marker just makes the replay free.
  *
  * 100 TB shape: per batch, ONE scan of the batch (key projection), a
  * TakeOrdered over (k + |batch|) rows, one k-row state write. State
  * is k rows forever — the stream itself is never retained. This is
  * what makes "keep a representative 1M-doc sample of the whole
  * corpus" an ingestion-time side effect instead of a full-corpus job.
  */
object SampleStore {

  private def raceKey(idCol: String, salt: String) =
    conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 13),
      16, 10).cast("long")

  /** Shared store plumbing: recover a crashed swap, honor the fold
    * watermark, run `winners` over (standing ∪ batch) id-deduped, land
    * the new state under the swap discipline. The tmp-name convention
    * matches CensusStore.compact so recoverSwap's crash states cover
    * this writer too: a crash after the tmp write reinstates tmp
    * (marker stamped ⇒ replay skipped; marker missing ⇒ the re-fold is
    * a no-op by idempotence).
    */
  private def foldWith(
      batch: DataFrame,
      idCol: String,
      path: String,
      batchId: Long)(winners: DataFrame => DataFrame): Unit = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    graft.streaming.StreamingFeatures.recoverSwap(fs, root)
    if (graft.streaming.StreamingFeatures.readBatchMarker(fs, root).exists(batchId <= _))
      return
    val exists = fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.endsWith(".parquet"))
    val cand =
      if (exists) spark.read.parquet(path).unionByName(batch).dropDuplicates(idCol)
      else batch
    val tmp = new org.apache.hadoop.fs.Path(
      root.getParent, s".${root.getName}__compacting")
    fs.delete(tmp, true)
    winners(cand).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    graft.streaming.StreamingFeatures.writeBatchMarker(fs, tmp, batchId)
    if (fs.exists(root)) graft.streaming.StreamingFeatures.swapIn(fs, root, tmp)
    else require(fs.rename(tmp, root), s"sample store: rename $tmp -> $root failed")
    ()
  }

  /** Fold one batch into the standing sample at `path`. */
  def fold(
      batch: DataFrame,
      idCol: String,
      k: Long,
      path: String,
      batchId: Long,
      salt: String = ""): Unit = {
    require(k >= 1 && k <= Int.MaxValue, s"sample size must be in [1, Int.Max], got $k")
    foldWith(batch.withColumn("__skey", raceKey(idCol, salt)), idCol, path, batchId)(
      _.orderBy(col("__skey"), col(idCol)).limit(k.toInt))
  }

  /** STRATIFIED standing sample: min(k, |group seen so far|) rows per
    * group, folded per batch — the same per-group race associativity
    * ([[TrainingData.exactSamplePerGroup]]'s key is a pure (id, salt)
    * function, so per-group winners of the union equal winners of
    * (standing ∪ batch)). State is ≤ k·|groups| rows; the keys are
    * recomputed per fold rather than stored, so the state schema is
    * exactly the ingested rows. Requires an integral unique `idCol`
    * (the bounded-heap contract).
    */
  def foldPerGroup(
      batch: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int,
      path: String,
      batchId: Long,
      salt: String = ""): Unit = {
    require(k >= 1, s"per-group sample size must be >= 1, got $k")
    foldWith(batch, idCol, path, batchId)(
      TrainingData.exactSamplePerGroup(_, idCol, groupCol, k, salt))
  }

  /** The standing sample (all ingested columns plus the race key). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    graft.streaming.StreamingFeatures.recoverSwap(fs, root)
    require(fs.exists(root), s"no sample state under $path - fold a batch first")
    spark.read.parquet(path)
  }

  /** Structured Streaming sink form: every micro-batch folds into the
    * standing sample — replay-safe via the batch-id watermark.
    */
  def sink(
      stream: DataFrame,
      idCol: String,
      k: Long,
      path: String,
      checkpoint: String,
      salt: String = ""): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        fold(b, idCol, k, path, id, salt)
      }
      .start()
}
