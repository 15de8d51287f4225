package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE INTO) over plain partitioned parquet — the
  * table-maintenance primitive the reference delegates to Delta
  * (reference: src/data/silver.py:52-59 `mode("overwrite")` full
  * rewrites) re-built as partition-scoped copy-on-write, so a
  * delta-sized batch of changed rows costs affected-partitions of IO
  * instead of a corpus rewrite.
  *
  * Two layers, deliberately separate:
  *
  *   - [[merge]]: the LOGICAL semantics (matched rows replaced
  *     wholesale, unmatched inserted) as a pure DataFrame transform —
  *     engine-replayable SQL (anti-join + union), which is what the
  *     DuckDB oracle replays.
  *   - [[upsertPartitioned]]: the PHYSICAL application of those
  *     semantics to a [[writeKeyedTable]] store, pruned by a per-
  *     partition key-range manifest exactly like
  *     [[TrainingData.deleteFromShards]] — only partitions that may
  *     contain a matched key, plus the partitions update rows land
  *     in, are read and rewritten (dynamic partition overwrite);
  *     every other data file is untouched.
  *
  * Scale shape: update batches are delta-sized, so their key set is
  * broadcast; the manifest is partitions-sized (metadata); rewrite
  * cost is O(affected partitions). Pruning effectiveness is
  * data-dependent in the same way as the shard store's: it bites when
  * keys correlate with partitions (monotone ids vs. date partitions —
  * the common append-mostly shape) and degrades to a full rewrite
  * when every partition's [min,max] key interval spans the id space.
  * Partition-movers (an update that changes a row's partition value)
  * are handled: the source partition is found via the key manifest,
  * the destination via the update row itself.
  */
object Upsert {

  /** MERGE INTO target USING updates ON keyCols:
    * WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *.
    *
    * Matched target rows are replaced by their update row WHOLESALE
    * (the reference pipelines re-derive full rows upstream, so
    * column-level SET lists are plan sugar this engine skips).
    * Precondition (standard MERGE contract): `updates` has at most one
    * row per key — enforce with [[requireUniqueKeys]] where the batch
    * provenance doesn't already guarantee it; a duplicate source key
    * would otherwise duplicate the target row, exactly like
    * SQL MERGE's "cannot update the same row twice" error.
    */
  def merge(target: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val keys = updates.select(keyCols.map(col): _*).distinct()
    target.join(keys, keyCols, "left_anti")
      .unionByName(updates.select(target.columns.map(col): _*))
  }

  /** [[merge]] with a delete arm: matched rows where `deleteWhen`
    * holds on the UPDATE row are dropped instead of replaced (MERGE's
    * WHEN MATCHED AND cond THEN DELETE). Delete rows whose key has no
    * target match are no-ops, as in SQL.
    */
  def mergeWithDelete(
      target: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      deleteWhen: org.apache.spark.sql.Column): DataFrame = {
    val flagged = updates.withColumn("__del", coalesce(deleteWhen.cast("boolean"), lit(false)))
    val delKeys = flagged.filter(col("__del")).select(keyCols.map(col): _*).distinct()
    val upserts = flagged.filter(!col("__del")).drop("__del")
    merge(target.join(delKeys, keyCols, "left_anti"), upserts, keyCols)
  }

  /** Fails fast (one metadata-sized action) if `updates` carries a
    * duplicate key — the precondition both [[merge]] and
    * [[upsertPartitioned]] document. Kept separate so batch sources
    * that are unique by construction don't pay the extra pass.
    */
  def requireUniqueKeys(updates: DataFrame, keyCols: Seq[String]): Unit = {
    val dup = updates.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"updates contain duplicate key ${dup.headOption.mkString} for ${keyCols.mkString(",")}")
  }

  /** Sink for an upsertable table: data partitioned by `partitionCol`
    * plus a `manifest` of per-partition key ranges (partition value,
    * min/max key, row count) — the metadata that lets
    * [[upsertPartitioned]] prune the rewrite set without opening data
    * files. Same layout discipline as [[TrainingData.writeShards]]:
    * one writer task per partition value, rows sorted by key within
    * files so per-file min/max stats stay narrow for key lookups.
    */
  def writeKeyedTable(
      df: DataFrame,
      outDir: String,
      partitionCol: String,
      keyCol: String): Unit = {
    df.withColumn("__p", col(partitionCol))
      .repartition(col("__p"))
      .sortWithinPartitions(col("__p"), col(keyCol))
      .drop("__p")
      .write.mode("overwrite").partitionBy(partitionCol).parquet(s"$outDir/data")
    keyManifest(df, partitionCol, keyCol)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$outDir/manifest")
  }

  /** Per-partition key-range manifest rows for `df`. */
  def keyManifest(df: DataFrame, partitionCol: String, keyCol: String): DataFrame =
    df.groupBy(col(partitionCol))
      .agg(
        min(col(keyCol)).as("first_key"),
        max(col(keyCol)).as("last_key"),
        count(lit(1)).as("n_rows"))

  /** Read back the data of a [[writeKeyedTable]] store. */
  def readKeyedTable(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/data")

  /** Apply a MERGE batch to a [[writeKeyedTable]] store, rewriting
    * only affected partitions. Affected =
    *
    *   - partitions whose manifest [first_key, last_key] interval
    *     contains an update key (possible MATCHED source rows, found
    *     without opening data files), union
    *   - partitions update rows land in (INSERT / partition-mover
    *     destinations, read off the batch itself).
    *
    * The rewrite is `kept-rows anti-join keys` union `updates`,
    * written with dynamic partition overwrite; partitions drained
    * entirely by movers get their stale directories removed, and the
    * manifest is updated incrementally (untouched rows pass through
    * the complement of the same range-join) behind an aside-rename
    * swap. Ids participate as broadcast DATA, never plan text — the
    * lesson of the delete OR-chain (SURVEY §9 r9 item 2). Update rows
    * for keys present in a partition the manifest does NOT cover are
    * inserts by definition, so correctness never depends on pruning,
    * only cost does. Returns the number of partitions rewritten.
    *
    * Precondition: unique keys per update batch ([[merge]] doc) and a
    * key-unique target (what writeKeyedTable + this op maintain
    * inductively).
    */
  def upsertPartitioned(
      spark: SparkSession,
      outDir: String,
      partitionCol: String,
      keyCol: String,
      updates: DataFrame): Int =
    applyKeyed(spark, outDir, partitionCol, keyCol, updates, updates.limit(0))

  /** Targeted delete from a keyed store: rows whose key appears in
    * `deleteKeys` (one-column DataFrame, any name) are removed,
    * rewriting only manifest-matched partitions. Same machinery as
    * [[upsertPartitioned]] with an empty upsert set.
    */
  def deleteKeys(
      spark: SparkSession,
      outDir: String,
      partitionCol: String,
      keyCol: String,
      deleteKeys: DataFrame): Int = {
    val data = spark.read.parquet(s"$outDir/data")
    val del = deleteKeys.select(
      col(deleteKeys.columns.head).cast(data.schema(keyCol).dataType).as(keyCol))
    applyKeyed(spark, outDir, partitionCol, keyCol, data.limit(0), del)
  }

  /** One MERGE batch against the store: `upserts` rows replace/insert
    * by key, `delKeys` keys are removed (a key in both is an upsert —
    * callers resolve op conflicts first, see
    * [[graft.streaming.CdcIngest]]). Affected partitions =
    * manifest-matched(all touched keys) ∪ upsert destinations; only
    * those rewrite. Returns the number of partitions rewritten.
    */
  def applyKeyed(
      spark: SparkSession,
      outDir: String,
      partitionCol: String,
      keyCol: String,
      upserts: DataFrame,
      delKeys: DataFrame): Int = {
    val updates = upserts
    val touched = broadcast(
      updates.select(col(keyCol).as("__u_key"))
        .union(delKeys.select(col(delKeys.columns.head).as("__u_key")))
        .distinct())
    // One key set drives both ops: every touched row leaves via the
    // anti-join, upserted keys come back from `updates` — so a key in
    // both sets resolves to its upsert row with no special casing.
    val keys = touched
    val manifest = spark.read.parquet(s"$outDir/manifest")
    val matchedParts = manifest
      .join(keys, col("__u_key").between(col("first_key"), col("last_key")), "left_semi")
      .select(col(partitionCol))
    val destParts = updates.select(col(partitionCol)).distinct()
    val affected = matchedParts.union(destParts).distinct().collect().map(_.get(0))
    if (affected.isEmpty) return 0

    // Static partition pruning: one isin over affected partition
    // values — bounded by partition count, never by batch size.
    val data = spark.read.parquet(s"$outDir/data")
    val kept = data
      .filter(col(partitionCol).isin(affected: _*))
      .join(keys, data(keyCol) === keys("__u_key"), "left_anti")
    // localCheckpoint: rewritten rows must survive the overwrite of
    // their own source files (cache would lazily re-read them).
    val out = kept
      .unionByName(updates.select(data.columns.map(col): _*))
      .localCheckpoint(true)

    val surviving = out.select(col(partitionCol)).distinct().collect().map(_.get(0)).toSet
    out
      .withColumn("__p", col(partitionCol))
      .repartition(col("__p"))
      .sortWithinPartitions(col("__p"), col(keyCol))
      .drop("__p")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(s"$outDir/data")
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName _
    (affected.toSet -- surviving).foreach { p =>
      fs.delete(new Path(
        s"$outDir/data/${esc(partitionCol)}=${esc(String.valueOf(p))}"), true)
    }

    // Untouched = complement of `affected` (which already unions the
    // range-join matches with the insert destinations).
    val untouched = manifest.filter(!col(partitionCol).isin(affected: _*))
    untouched.unionByName(keyManifest(out, partitionCol, keyCol))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$outDir/manifest.tmp")
    val mPath = new Path(s"$outDir/manifest")
    val mTmp = new Path(s"$outDir/manifest.tmp")
    val mOld = new Path(s"$outDir/manifest.old")
    fs.delete(mOld, true)
    fs.rename(mPath, mOld)
    require(fs.rename(mTmp, mPath), s"manifest swap failed; previous manifest at $mOld")
    fs.delete(mOld, true)
    affected.length
  }
}
