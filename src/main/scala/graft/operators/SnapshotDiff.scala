package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of a keyed table — the
  * change-data-capture primitive a pipeline without table-format ACID
  * (the parquet seam, SURVEY §1.4) still needs: which documents were
  * added, removed, or changed between corpus versions, to drive
  * incremental dedup/re-chunking instead of full recomputes.
  *
  * Content identity is md5 over the compare columns (null-safe,
  * separator-framed), so "changed" is engine-replayable, not
  * Spark-specific. Scale shape: the hash is a row-local projection
  * (the wide columns never shuffle — only id + 32-byte digest cross
  * the wire), then ONE full-outer equi-join on the key; output is
  * delta-sized when drift is small.
  */
object SnapshotDiff {

  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      idCol: String,
      compareCols: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    // u0001-framed with a u0000 null marker: without the separator
    // ("ab","c") and ("a","bc") would hash identically, and a skipped
    // null would merge its neighbors.
    def hashed(df: DataFrame, alias: String) = df.select(
      col(idCol),
      md5(concat_ws("\u0001",
        compareCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(alias))
    val j = hashed(before, "_hb").join(hashed(after, "_ha"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("_hb").isNull, "added")
          .when(col("_ha").isNull, "removed")
          .when(col("_hb") =!= col("_ha"), "changed")
          .otherwise("unchanged"))
    val out = if (includeUnchanged) j else j.filter(col("status") =!= "unchanged")
    out.select(col(idCol), col("status"))
  }
}
