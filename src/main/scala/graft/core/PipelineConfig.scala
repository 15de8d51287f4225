package graft.core

import java.sql.Timestamp

/** Paths and knobs for the medallion pipeline (reference: run_pipeline.py:22-31).
  *
  * `format` abstracts the at-rest table format: the reference writes Delta
  * (reference: config/spark_config.py:24-26), which is not on the classpath
  * here; Parquet preserves every semantic the reference actually uses
  * (overwrite, append, partitionBy). Delta's `overwriteSchema` option
  * (reference: src/data/silver.py:56) is Delta-only and intentionally
  * dropped — a documented no-op under Parquet.
  *
  * `splitTimestamp` is the chronological train/test boundary
  * (reference: src/data/silver.py:45-49).
  */
final case class PipelineConfig(
    root: String,
    format: String = "parquet",
    splitTimestamp: Timestamp = Timestamp.valueOf("2023-10-20 12:00:00")) {

  def rawCsv: String = s"$root/raw/transactions"
  def bronze: String = s"$root/bronze/transactions"
  def quarantine: String = s"$root/bronze/quarantine"
  def silver(split: String): String = s"$root/silver/$split"
  def features(split: String): String = s"$root/features/$split"
  def goldDaily: String = s"$root/gold/daily_fraud_summary"
  def goldHourly: String = s"$root/gold/hourly_patterns"
  def predictions: String = s"$root/gold/predictions"
  def modelDir: String = s"$root/models/fraud_rf"
}
