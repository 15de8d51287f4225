package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row
  * whose timestamp is as-of the left timestamp for the same key —
  * backward (greatest right-ts <= left-ts, the default), forward
  * (smallest right-ts >= left-ts), or nearest (closer of the two,
  * backward on ties). Optional tolerance bounds the match distance.
  * Spark has no native operator for this; the scalable composition is
  * the union + window trick:
  *
  *   1. tag both inputs and union them on (key, ts) — no pair blowup;
  *   2. one window pass per key ordered by (ts, tag): `last` of the
  *      right payload with ignoreNulls carries the adjacent right row
  *      onto every left row (ascending order for backward, descending
  *      for forward; nearest runs both frames over the SAME exchange —
  *      Catalyst plans one hash shuffle and two sorts);
  *   3. keep left rows.
  *
  * Cost: ONE hash-partition shuffle of |L| + |R| rows — versus the
  * naive inequality join whose intermediate is |L| x (orders per key).
  * Ties (right.ts == left.ts) match in every direction, per standard
  * as-of semantics; among right rows sharing a timestamp the highest
  * `rightOrderCol` wins backward and the lowest wins forward, keeping
  * results deterministic.
  */
object AsOfJoin {

  /** @param rightPayload columns of `right` to carry onto matched left rows
    * @param rightOrderCol deterministic tie-break among right rows with
    *                      equal timestamps (e.g. a unique id)
    * @param direction "backward" | "forward" | "nearest"
    * @param toleranceSeconds max |left.ts - right.ts| for a match, if set
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
      keepUnmatched: Boolean = false,
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction: $direction")
    val leftCols = left.columns.toSeq

    // Type-aware epoch seconds: numeric ts columns pass through; date /
    // timestamp / timestamp_ntz go via unix_micros (NTZ casts to TZ under
    // the session UTC timezone; double can't be cast from NTZ directly).
    import org.apache.spark.sql.types.{DataType, NumericType}
    def epochSeconds(c: Column, dt: DataType): Column = dt match {
      case _: NumericType => c.cast("double")
      case _ => unix_micros(c.cast("timestamp")).cast("double") / lit(1e6)
    }
    val rightTsType = right.schema(rightTs).dataType
    val leftTsType = left.schema(leftTs).dataType

    // Payload struct carries the right timestamp (epoch seconds) so
    // nearest/tolerance can measure match distance.
    val rtsCol = epochSeconds(col(rightTs), rightTsType).as("_rts")
    val payloadStruct = struct((rtsCol +: rightPayload.map(col)): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        right.select(rtsCol +: rightPayload.map(col): _*).schema.fields))

    val lUnion = left
      .withColumn("_k", col(leftKey))
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_ord", lit(Long.MaxValue))
      .withColumn("_payload", nullPayload)
      .select(leftCols.map(col) ++
        Seq(col("_k"), col("_ts"), col("_side"), col("_ord"), col("_payload")): _*)

    // Right side takes left-shaped null columns so the union schemas align.
    val rUnion = right
      .withColumn("_k", col(rightKey))
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_ord", col(rightOrderCol).cast("long"))
      .withColumn("_payload", payloadStruct)
      .select(
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(col("_k"), col("_ts"), col("_side"), col("_ord"), col("_payload")): _*)

    val unioned = rUnion.unionByName(lUnion)

    // Right rows sort before left rows at equal ts in traversal order
    // (side 0 < 1 ascending and descending alike), so an equal-timestamp
    // right row is always visible to the left row. _ord breaks ties
    // among right rows deterministically: ascending traversal keeps the
    // highest (last seen), descending keeps the lowest.
    val wBack = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_side").asc, col("_ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy("_k")
      .orderBy(col("_ts").desc, col("_side").asc, col("_ord").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val lts = epochSeconds(col("_ts"), leftTsType)
    def within(m: Column): Column = toleranceSeconds match {
      case Some(tol) => when(abs(lts - m.getField("_rts")) <= tol, m)
      case None => m
    }

    val matched = direction match {
      case "backward" =>
        unioned.withColumn("_match",
          within(last(col("_payload"), ignoreNulls = true).over(wBack)))
      case "forward" =>
        unioned.withColumn("_match",
          within(last(col("_payload"), ignoreNulls = true).over(wFwd)))
      case "nearest" =>
        val b = within(last(col("_payload"), ignoreNulls = true).over(wBack))
        val f = within(last(col("_payload"), ignoreNulls = true).over(wFwd))
        unioned
          .withColumn("_b", b)
          .withColumn("_f", f)
          .withColumn("_match",
            when(col("_b").isNull, col("_f"))
              .when(col("_f").isNull, col("_b"))
              // backward wins ties: strictly-closer forward required
              .when(abs(col("_f").getField("_rts") - lts) <
                abs(lts - col("_b").getField("_rts")), col("_f"))
              .otherwise(col("_b")))
          .drop("_b", "_f")
    }

    val carried = matched.filter(col("_side") === 1)
    val filtered = if (keepUnmatched) carried else carried.filter(col("_match").isNotNull)
    val withPayload = rightPayload.foldLeft(filtered) { (df, c) =>
      df.withColumn(c, col("_match").getField(c))
    }
    withPayload.select((leftCols ++ rightPayload).map(col): _*)
  }
}
