package graft.schema

import org.apache.spark.sql.types._

/** Hand-declared transaction schemas, mirroring the reference's two
  * `StructType`s (reference: src/data/schemas.py:8-28 and
  * src/data/ingestion.py:13-32). Inference is deliberately avoided: at
  * 100 TB a schema-inference pass is a full extra scan, and silent type
  * widening breaks downstream feature code.
  */
object TransactionSchema {

  /** Timestamp format of the raw CSV (reference: src/data/ingestion.py:73). */
  val RawTimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  /** Name of the PERMISSIVE-mode quarantine capture column
    * (reference: src/data/schemas.py:27).
    */
  val CorruptRecordColumn = "_corrupt_record"

  private def fields(corrupt: Boolean, strictNullability: Boolean): Seq[StructField] = {
    def nn(nullable: Boolean) = if (strictNullability) nullable else true
    Seq(
      StructField("transaction_id", StringType, nullable = false),
      StructField("timestamp", TimestampType, nullable = nn(false)),
      StructField("sender_account", StringType, nullable = nn(false)),
      StructField("receiver_account", StringType, nullable = nn(false)),
      StructField("amount", DoubleType, nullable = nn(false)),
      StructField("transaction_type", StringType, nullable = nn(false)),
      StructField("merchant_category", StringType, nullable = nn(false)),
      StructField("location", StringType, nullable = nn(false)),
      StructField("device_used", StringType, nullable = nn(false)),
      StructField("is_fraud", BooleanType, nullable = nn(false)),
      StructField("fraud_type", StringType, nullable = true),
      StructField("time_since_last_transaction", DoubleType, nullable = true),
      StructField("spending_deviation_score", DoubleType, nullable = true),
      StructField("velocity_score", IntegerType, nullable = true),
      StructField("geo_anomaly_score", DoubleType, nullable = true),
      StructField("payment_channel", StringType, nullable = true),
      StructField("ip_address", StringType, nullable = true),
      StructField("device_hash", StringType, nullable = true)
    ) ++ (if (corrupt) Seq(StructField(CorruptRecordColumn, StringType, nullable = true)) else Nil)
  }

  /** 19-field schema with quarantine column (reference: src/data/schemas.py:8-28).
    * CSV PERMISSIVE reads require every declared field nullable so that a
    * malformed row can be fully captured; nullability is enforced by the
    * quality gate, not the reader.
    */
  val transactionSchema: StructType = StructType(fields(corrupt = true, strictNullability = false))

  /** 18-field raw schema, no quarantine column (reference: src/data/ingestion.py:13-32). */
  val rawTransactionSchema: StructType = StructType(fields(corrupt = false, strictNullability = false))
}
