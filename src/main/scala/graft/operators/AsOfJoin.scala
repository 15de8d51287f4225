package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row
  * with the greatest right-timestamp <= left-timestamp for the same key.
  * Spark has no native operator for this; the scalable composition is the
  * union + window trick:
  *
  *   1. tag both inputs and union them on (key, ts) — no pair blowup;
  *   2. one window pass per key ordered by (ts, tag): `last_value` of the
  *      right payload with ignoreNulls carries the most recent right row
  *      forward to every subsequent left row;
  *   3. keep left rows.
  *
  * Cost: ONE hash-partition shuffle + sort of |L| + |R| rows — versus the
  * naive inequality join whose intermediate is |L| x (orders per key).
  * Ties (right.ts == left.ts) match, per standard as-of semantics; among
  * right rows sharing a timestamp the highest `rightOrderCol` wins, which
  * keeps the result deterministic.
  */
object AsOfJoin {

  /** @param rightPayload columns of `right` to carry onto matched left rows
    * @param rightOrderCol deterministic tie-break among right rows with
    *                      equal timestamps (e.g. a unique id)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightOrderCol: String,
      keepUnmatched: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq

    val lTagged = left
      .withColumn("_k", col(leftKey))
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_ord", lit(Long.MaxValue))
      .withColumn("_payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields)))

    // Right side takes left-shaped null columns so the union schemas align.
    val rUnion = right
      .withColumn("_k", col(rightKey))
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_ord", col(rightOrderCol).cast("long"))
      .withColumn("_payload", struct(rightPayload.map(col): _*))
      .select(
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(col("_k"), col("_ts"), col("_side"), col("_ord"), col("_payload")): _*)

    val lUnion = lTagged.select(
      leftCols.map(col) ++ Seq(col("_k"), col("_ts"), col("_side"), col("_ord"), col("_payload")): _*)

    // Right rows sort before left rows at equal ts (side 0 < 1), so an
    // equal-timestamp right row is visible to the left row. _ord breaks
    // ties among right rows deterministically.
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"), col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rUnion.unionByName(lUnion)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val withPayload = rightPayload.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("_match").getField(c))
    }
    val result = withPayload.select((leftCols ++ rightPayload).map(col): _*)
    if (keepUnmatched) result else result.filter(col(rightPayload.head).isNotNull)
  }
}
