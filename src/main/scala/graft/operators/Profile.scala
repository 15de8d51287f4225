package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass data profiling: per-column row/null/distinct counts and
  * value ranges for a whole table — the "what is in this 100 TB
  * directory" first question. All statistics for all columns are
  * computed in ONE aggregation over one scan (the same fused-suite
  * discipline as quality.CheckSuite): profiling N columns must not cost
  * N scans.
  *
  * Output is melted to one row per column (column, data_type, n_rows,
  * n_nulls, n_distinct, min_value, max_value — values rendered as
  * strings so heterogeneous types share a schema). Timestamps render as
  * unix micros for engine-portable comparisons. `exactDistinct` trades
  * the default approx_count_distinct sketch (bounded memory, the 100 TB
  * path) for exact counts (one extra distinct-agg pass per column — the
  * oracle-comparable mode).
  */
object Profile {

  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    val cols = df.schema.fields
    require(cols.nonEmpty, "cannot profile a zero-column frame")
    def render(f: StructField, c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      f.dataType match {
        case TimestampType | TimestampNTZType => unix_micros(c).cast("string")
        case DateType => c.cast("string")
        case _: DecimalType | DoubleType | FloatType => c.cast("double").cast("string")
        // No portable ordering/rendering for nested or binary values —
        // counts still profile them, ranges stay null.
        case _: ArrayType | _: MapType | _: StructType | BinaryType =>
          lit(null).cast("string")
        case _ => c.cast("string")
      }
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      val distinct = f.dataType match {
        case _: MapType => lit(null).cast("long") // maps are not hashable
        case _ if exactDistinct => count_distinct(c)
        case _ => approx_count_distinct(c)
      }
      val (mn, mx) = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType =>
          (lit(null).cast("string"), lit(null).cast("string"))
        case _ => (render(f, min(c)), render(f, max(c)))
      }
      Seq(
        count(c).as(s"__cnt_${f.name}"),
        distinct.as(s"__dst_${f.name}"),
        mn.as(s"__min_${f.name}"),
        mx.as(s"__max_${f.name}"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs.toSeq: _*)
    // Melt the single wide row into one row per column: stack() keeps it
    // in-plan (no driver round-trip), and the input is ONE row so the
    // generate is free.
    val stackArgs = cols.flatMap { f =>
      Seq(
        lit(f.name),
        lit(f.dataType.simpleString),
        col("__rows") - col(s"__cnt_${f.name}"),
        col(s"__dst_${f.name}"),
        col(s"__min_${f.name}"),
        col(s"__max_${f.name}"))
    }
    wide.select(
      col("__rows").as("n_rows"),
      stack(
        Seq(lit(cols.length)) ++ stackArgs: _*
      ).as(Seq("column", "data_type", "n_nulls", "n_distinct", "min_value", "max_value")))
      .select("column", "data_type", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }
}
