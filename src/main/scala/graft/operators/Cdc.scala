package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — the consuming side of the CDC
  * primitives ([[SnapshotDiff]] PRODUCES deltas; this applies them).
  * A pipeline without table-format ACID still has to ingest upstream
  * changelogs (Debezium-shaped op streams, tombstone feeds) and keep
  * dimension history; both are plain relational algebra once the
  * "latest change wins" reduction is expressed as a rank window over
  * the DELTA (never the snapshot).
  *
  * Scale shape: the changelog is delta-sized, so its per-key
  * reduction shuffles only the delta; the snapshot participates in
  * exactly one key equi-join (anti + union), which AQE broadcasts
  * when the reduced delta is small. Nothing here scans the snapshot
  * twice, and nothing is quadratic.
  */
object Cdc {

  /** Apply an ordered changelog to a keyed snapshot. `changes` carries
    * the full row payload plus `opCol` ('upsert' | 'delete',
    * case-insensitive) and `seqCol` (any ordered type: offset, LSN,
    * event time). Per key the HIGHEST-seq change wins — intermediate
    * versions collapse before the snapshot is touched, so replaying a
    * day's changelog costs one delta window + one key join regardless
    * of how many times a key churned. Delete-then-reinsert within one
    * batch therefore resolves to whatever the latest seq says, exactly
    * like log-compacted Kafka topics.
    *
    * Precondition: (key, seq) pairs are unique — equal seqs for one
    * key make "latest" undefined (same contract as any LSN-ordered
    * log). Deletes for absent keys are no-ops.
    */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String): DataFrame = {
    val latest = changes
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // Project straight to the snapshot schema: op (and seq, unless the
    // snapshot itself carries it — a CDC-maintained store does, see
    // [[graft.streaming.CdcIngest]]) fall away here.
    val upserts = latest.filter(lower(col(opCol)) =!= "delete")
      .select(snapshot.columns.map(col): _*)
    val touchedKeys = latest.select(col(keyCol)).distinct()
    snapshot.join(touchedKeys, Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }

  /** Initialize an SCD Type-2 dimension from a plain snapshot: one
    * open version per key. `validTo` is an open-interval NULL;
    * `is_current` is the flag query predicates actually use (a NULL
    * comparison in a filter silently drops rows — the flag keeps
    * consumer SQL sargable and honest).
    */
  def scd2Init(snapshot: DataFrame, validFrom: Column): DataFrame =
    snapshot
      .withColumn("valid_from", validFrom)
      // NULL of validFrom's type without resolving it eagerly: the
      // never-true branch types the column, the missing else yields
      // NULL (validFrom may be an unresolved expression here, so
      // .expr.dataType would throw).
      .withColumn("valid_to", when(lit(false), validFrom))
      .withColumn("is_current", lit(true))

  /** Fold a new attribute snapshot into an SCD Type-2 dimension
    * (Kimball slowly-changing-dimension type 2): keys whose tracked
    * attributes changed get their open version CLOSED (valid_to =
    * asOf, is_current = false) and a new open version inserted;
    * brand-new keys insert an open version; unchanged keys and all
    * already-closed history pass through untouched. Change detection
    * is the same separator-framed null-safe md5 as [[SnapshotDiff]],
    * so "changed" is engine-replayable.
    *
    * `updates` is a plain snapshot of the dimension's natural schema
    * (no SCD columns) — the shape upstream extracts arrive in.
    * Deletes are out of scope by design: a vanished key simply stops
    * receiving updates and its last version stays open, which is the
    * standard Kimball treatment (a hard delete is an [[applyChangelog]]
    * job over the closed table, not a dimension-history event).
    *
    * Scale shape: history (the big side) is touched once — an
    * anti-join complement plus a union of delta-sized closed/opened
    * sets; change detection joins only CURRENT rows against the
    * update snapshot on the key, digests first (wide attributes never
    * cross the wire, [[SnapshotDiff]]'s discipline).
    */
  def scd2Apply(
      dim: DataFrame,
      updates: DataFrame,
      keyCol: String,
      compareCols: Seq[String],
      asOf: Column): DataFrame = {
    require(compareCols.nonEmpty, "need at least one tracked attribute column")
    val attrCols = updates.columns.toSeq
    require(!attrCols.exists(Set("valid_from", "valid_to", "is_current")),
      "updates must carry the natural schema, not SCD columns")
    def digest(df: DataFrame): Column =
      md5(concat_ws("\u0001",
        compareCols.map(c => coalesce(df(c).cast("string"), lit("\u0000"))): _*))

    val current = dim.filter(col("is_current"))
    val curKeyed = current.select(col(keyCol), digest(current).as("__h_cur"))
    val updKeyed = updates.select(col(keyCol).as("__u_key"), digest(updates).as("__h_upd"))

    // Per-key verdict, digest-sized rows only.
    val verdict = curKeyed.join(updKeyed, curKeyed(keyCol) === updKeyed("__u_key"), "full_outer")
      .select(
        coalesce(curKeyed(keyCol), col("__u_key")).as(keyCol),
        when(curKeyed(keyCol).isNull, lit("new"))
          .when(col("__u_key").isNull, lit("absent"))
          .when(col("__h_cur") =!= col("__h_upd"), lit("changed"))
          .otherwise(lit("same")).as("__v"))

    val changedKeys = verdict.filter(col("__v") === "changed").select(col(keyCol))
    val openKeys = verdict.filter(col("__v").isin("changed", "new")).select(col(keyCol))

    val closed = current.join(changedKeys, Seq(keyCol), "left_semi")
      .withColumn("valid_to", asOf)
      .withColumn("is_current", lit(false))
    // Using-column joins throughout: verdict shares lineage with both
    // `current` and `updates`, and dataframe-qualified equality
    // predicates on shared lineage trip Spark's ambiguous-self-join
    // detection; USING-joins resolve by position instead.
    val opened = updates.join(openKeys, Seq(keyCol), "left_semi")
    val untouched = dim
      .filter(!col("is_current"))
      .unionByName(current.join(changedKeys, Seq(keyCol), "left_anti"))
    untouched
      .unionByName(closed)
      .unionByName(scd2Init(opened, asOf).select(untouched.columns.map(col): _*))
  }
}
