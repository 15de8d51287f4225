package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for MERGEABLE COUNT CENSUSES — any (key, n) frequency
  * table whose merge is "counts add": the substring-dedup gram census
  * ([[SubstringDedup]]) and the token census behind frozen-LM
  * surprisal scoring ([[CorpusStats.surprisalAgainstCensus]]) share
  * this layer verbatim.
  *
  * Layout and guarantees (proven in SubstringDedupSpec's streaming
  * test against this same code path):
  *   - each batch's delta lands OVERWRITE under `$path/delta=<batchId>`
  *     — a Structured Streaming replay of the same batch id rewrites
  *     the identical delta, so pre-compaction appends are idempotent BY
  *     CONSTRUCTION;
  *   - the live census is the monoid fold of every delta;
  *   - compaction folds the pile into the single base `delta=-1`
  *     (never a real batch id) and swaps it in under
  *     [[graft.streaming.StreamingFeatures.swapIn]]'s crash-safe
  *     rename discipline; readers run `recoverSwap` first so a crashed
  *     compaction never hides data;
  *   - compaction stamps the HIGHEST FOLDED batch id into the swapped-in
  *     dir ([[graft.streaming.StreamingFeatures.BatchMarker]], the same
  *     sidecar the compacting file sink uses), and [[appendDelta]] skips
  *     any batch at or below the marker: a streaming replay of a batch
  *     whose delta was already folded into the base would otherwise
  *     re-create the delta and DOUBLE its counts — turning "unique"
  *     grams into n > 1 and silently stripping legitimate text
  *     downstream. Overwrite-idempotency alone only covers replays of
  *     deltas that still exist.
  */
object CensusStore {

  /** Monoid merge of two (keyCol, n) censuses: counts add. */
  def merge(a: DataFrame, b: DataFrame, keyCol: String): DataFrame =
    a.unionByName(b).groupBy(col(keyCol)).agg(sum(col("n")).as("n"))

  def appendDelta(census: DataFrame, path: String, batchId: Long): Unit = {
    require(batchId >= 0,
      s"batchId must be >= 0 (delta=-1 is the compacted base), got $batchId")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(census.sparkSession.sessionState.newHadoopConf())
    graft.streaming.StreamingFeatures.recoverSwap(fs, root)
    // Replay of a batch already folded into the compacted base: its
    // counts are inside delta=-1, so re-writing the delta would double
    // them. The marker is the fold watermark — skip at or below it.
    if (graft.streaming.StreamingFeatures.readBatchMarker(fs, root).exists(batchId <= _))
      return
    census.write.mode(SaveMode.Overwrite).parquet(s"$path/delta=$batchId")
  }

  def read(spark: SparkSession, path: String, keyCol: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    graft.streaming.StreamingFeatures.recoverSwap(fs, root)
    // Fail with OUR message, not a generic PATH_NOT_FOUND from the scan:
    // an empty/missing census almost always means the sink never ran.
    require(fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("delta=")),
      s"no census deltas under $path - append a delta first")
    spark.read.parquet(path)
      .groupBy(col(keyCol)).agg(sum(col("n")).as("n"))
  }

  def compact(spark: SparkSession, path: String, keyCol: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    graft.streaming.StreamingFeatures.recoverSwap(fs, root)
    if (!fs.exists(root)) return
    val deltas = fs.listStatus(root).filter(_.getPath.getName.startsWith("delta="))
    if (deltas.length <= 1) return
    val tmp = new org.apache.hadoop.fs.Path(
      root.getParent, s".${root.getName}__compacting")
    fs.delete(tmp, true)
    spark.read.parquet(path)
      .groupBy(col(keyCol)).agg(sum(col("n")).as("n"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$tmp/delta=-1")
    // Fold watermark: the highest batch id whose delta is now inside the
    // base (carrying any earlier watermark forward). It rides INSIDE the
    // swapped-in dir, so post-swap readers and appendDelta's replay guard
    // see it atomically with the compacted data.
    val folded = deltas
      .map(_.getPath.getName.stripPrefix("delta=").toLong).filter(_ >= 0) ++
      graft.streaming.StreamingFeatures.readBatchMarker(fs, root)
    if (folded.nonEmpty)
      graft.streaming.StreamingFeatures.writeBatchMarker(fs, tmp, folded.max)
    graft.streaming.StreamingFeatures.swapIn(fs, root, tmp)
  }
}
