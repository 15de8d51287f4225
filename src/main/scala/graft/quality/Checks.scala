package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate, re-expressing the reference's Great Expectations
  * surface (reference: src/validation/data_quality.py:29-43) as a tiny
  * native check library.
  *
  * Engine-level improvement over the reference, semantics preserved: GX
  * evaluates N expectations as N separate scans; here every row-level
  * check compiles to one `sum(when(violated,1))` term inside a single
  * aggregate, so the whole suite is **one pass** over the data — at
  * 100 TB the difference between one scan and eight.
  */
sealed trait Check {
  def name: String
}

/** Schema-level check (reference: data_quality.py:29-31). */
final case class ColumnExists(column: String) extends Check {
  val name = s"column_exists($column)"
}

/** Row-level checks reduce to a violation predicate. */
sealed trait RowCheck extends Check {
  def column: String
  def violation: Column
}

/** reference: data_quality.py:32-33 */
final case class NotNull(column: String) extends RowCheck {
  val name = s"not_null($column)"
  def violation: Column = col(column).isNull
}

/** reference: data_quality.py:34-35 (bounds inclusive) */
final case class Between(column: String, lo: Double, hi: Double) extends RowCheck {
  val name = s"between($column,$lo,$hi)"
  def violation: Column = col(column).isNotNull && (col(column) < lo || col(column) > hi)
}

/** reference: data_quality.py:36 */
final case class InSet(column: String, allowed: Seq[Any]) extends RowCheck {
  val name = s"in_set($column)"
  def violation: Column = col(column).isNotNull && !col(column).isin(allowed: _*)
}

final case class CheckReport(
    rows: Long,
    missingColumns: Seq[String],
    violations: Map[String, Long]) {
  def failed: Seq[String] =
    missingColumns.map(c => s"column_exists($c)") ++
      violations.collect { case (n, v) if v > 0 => n }.toSeq.sorted
  def passed: Boolean = failed.isEmpty
}

/** Fail-closed gate: a failed suite aborts the pipeline stage
  * (reference: data_quality.py:41-43, ingestion.py:44-48).
  */
final class DataQualityException(report: CheckReport)
    extends RuntimeException(s"data quality checks failed: ${report.failed.mkString(", ")}")

object CheckSuite {

  /** Run all checks in a single aggregate pass. */
  def run(df: DataFrame, checks: Seq[Check]): CheckReport = {
    val present = df.schema.fieldNames.toSet
    val missing = checks.collect { case ColumnExists(c) if !present.contains(c) => c }
    val rowChecks = checks.collect { case rc: RowCheck if present.contains(rc.column) => rc }
    if (rowChecks.isEmpty) {
      CheckReport(df.count(), missing, Map.empty)
    } else {
      val aggs = count(lit(1)).as("_rows") +:
        rowChecks.map(rc => sum(when(rc.violation, 1L).otherwise(0L)).as(rc.name))
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val violations = rowChecks.zipWithIndex.map { case (rc, i) =>
        rc.name -> Option(row.get(i + 1)).map(_.asInstanceOf[Long]).getOrElse(0L)
      }.toMap
      CheckReport(row.getLong(0), missing, violations)
    }
  }

  /** Run and throw on failure (fail-closed, reference: data_quality.py:41-43). */
  def requirePass(df: DataFrame, checks: Seq[Check]): CheckReport = {
    val report = run(df, checks)
    if (!report.passed) throw new DataQualityException(report)
    report
  }

  /** The silver-layer suite of the reference (data_quality.py:29-36). */
  def silverSuite: Seq[Check] = Seq(
    ColumnExists("transaction_id"),
    ColumnExists("amount"),
    ColumnExists("label"),
    NotNull("transaction_id"),
    NotNull("amount"),
    Between("amount", 0, Double.MaxValue),
    Between("txn_hour", 0, 23),
    InSet("label", Seq(0, 1))
  )
}
