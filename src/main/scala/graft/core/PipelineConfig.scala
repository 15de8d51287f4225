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
  *
  * `blockedFeatures` selects the skew-proof blocked window forms
  * (`BehavioralFeatures.addFeaturesBlocked`) for the features stage.
  * Output is bit-identical to the plain forms (oracle- and
  * spec-pinned); the trade is 9 bounded shuffles vs 1 skewed one.
  * Default false: on skew-free data the single-shuffle plan is
  * cheaper. Turn on when one account can dominate a window partition
  * (bots, exchange wallets) — at 100 TB that hot key is the straggler
  * that stalls the whole stage.
  *
  * `jdbcMartUrl`, when set, additionally exports the gold summaries to
  * an RDBMS after the gold stage (the reference's "downstream systems
  * read the marts" edge, gold.py) — offline that is embedded Derby, in
  * a deployment the same call points at Postgres/MySQL. Gold tables
  * are aggregate-sized, so the export is a metadata-scale write, never
  * a corpus-scale one.
  */
final case class PipelineConfig(
    root: String,
    format: String = "parquet",
    splitTimestamp: Timestamp = Timestamp.valueOf("2023-10-20 12:00:00"),
    blockedFeatures: Boolean = false,
    jdbcMartUrl: Option[String] = None) {

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
