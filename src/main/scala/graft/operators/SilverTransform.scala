package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver layer: temporal derivations + chronological train/test split
  * (reference: src/data/silver.py:28-59).
  *
  * The split is two pushdown-friendly range filters on `timestamp`
  * (reference: silver.py:45-49) — NOT `randomSplit`. Chronology is the
  * point: the model must never train on the future. Both filters push to
  * the scan, and with bronze partitioned by `ingestion_date` they prune
  * partitions instead of reading 100 TB twice.
  */
object SilverTransform {

  /** Temporal features + label (reference: silver.py:34-38).
    * `dayofweek` keeps Spark's 1=Sunday..7=Saturday convention (SURVEY F4).
    */
  def transform(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("txn_hour", hour(col("timestamp")))
      .withColumn("txn_day_of_week", dayofweek(col("timestamp")))
      .withColumn("is_weekend", when(col("txn_day_of_week").isin(1, 7), 1).otherwise(0))
      .withColumn("label", col("is_fraud").cast("int"))
      .na.fill(Map("fraud_type" -> "none"))

  /** Chronological split (reference: silver.py:45-49). Uses an explicit
    * Timestamp literal instead of the reference's string-literal coercion
    * — same result under the UTC session timezone, no implicit cast in
    * the plan.
    */
  def chronoSplit(df: DataFrame, splitTs: Timestamp): (DataFrame, DataFrame) =
    (df.filter(col("timestamp") < lit(splitTs)), df.filter(col("timestamp") >= lit(splitTs)))
}
