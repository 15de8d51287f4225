package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Where streams are born: a seam between the TRANSPORT records arrive
  * on and what the pipeline does with them, so moving an arm from a
  * watched directory to a Kafka topic is a config swap, not a code
  * change. Downstream (gates, chunker, windowed aggs, the compacting
  * sink, the IVF/PQ ingests) consumes the logical record schema and
  * never sees the transport.
  *
  * The reference consumes files only (pyspark-anomaly-detection runs
  * batch jobs over CSV/parquet; no broker anywhere in its surface) —
  * the broker-shaped source is an engine extension modeled on the
  * standard spark-sql-kafka envelope (key/value binary + topic/
  * partition/offset/timestamp), which keeps the decode half fully
  * testable offline: [[FileEnvelopeSource]] replays the SAME envelope
  * from parquet, so every line downstream of the connector's `load()`
  * is exercised without a broker. The connector jar itself is absent in
  * this environment (zero egress — documented like Delta/MLflow).
  */
sealed trait StreamSource {
  /** A STREAMING DataFrame of logical records. */
  def load(spark: SparkSession): DataFrame
}

/** Directory-watch source — records arrive as columnar files. The
  * file-count-per-trigger and glob knobs are Spark's own options; at
  * scale this is the "landing zone" pattern (object-store prefix fed by
  * an upstream writer).
  */
final case class FileRecordSource(
    dir: String,
    schema: StructType,
    format: String = "parquet") extends StreamSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema).format(format).load(dir)
}

/** Kafka source: subscribes through the spark-sql-kafka connector and
  * decodes the broker envelope with [[KafkaEnvelope.decode]]. Requires
  * the connector jar and a broker at RUNTIME; construction is plain
  * config. Everything downstream of the envelope is shared with
  * [[FileEnvelopeSource]] — that is the seam's guarantee.
  */
final case class KafkaRecordSource(
    bootstrapServers: String,
    topic: String,
    schema: StructType,
    startingOffsets: String = "earliest") extends StreamSource {
  def load(spark: SparkSession): DataFrame =
    KafkaEnvelope.decode(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load(),
      schema)
}

/** The file transport of the SAME broker envelope: rows shaped exactly
  * like the connector's output ([[KafkaEnvelope.envelopeSchema]]) read
  * from parquet. This is the offline stand-in that proves the decode
  * path — swapping it for [[KafkaRecordSource]] changes transport
  * config only (streamed == batch golden in CorpusPipelineSpec runs
  * through this source).
  */
final case class FileEnvelopeSource(dir: String, schema: StructType) extends StreamSource {
  def load(spark: SparkSession): DataFrame =
    KafkaEnvelope.decode(
      spark.readStream.schema(KafkaEnvelope.envelopeSchema).parquet(dir), schema)
}

/** The spark-sql-kafka record envelope and its record codec (JSON
  * values — the lingua franca for heterogeneous producers; a binary
  * codec would slot in the same two functions).
  */
object KafkaEnvelope {

  /** The connector's fixed output schema (spark-sql-kafka docs). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Envelope -> typed records: parse the JSON value against the
    * logical schema. PERMISSIVE by from_json's contract — a malformed
    * value yields a null struct, which `.*` turns into all-null columns
    * rather than killing the stream (quarantine on `r IS NULL`
    * upstream of the gates if the producer is untrusted).
    */
  def decode(envelope: DataFrame, schema: StructType): DataFrame =
    envelope
      .select(from_json(col("value").cast("string"), schema).as("__r"))
      .select(col("__r.*"))

  /** Records -> envelope rows, for producing fixture topics and for a
    * kafka SINK arm (to_json value, stringified key — the standard
    * producer projection).
    */
  def encode(records: DataFrame, keyCol: String, topic: String): DataFrame =
    records.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(records.columns.map(col): _*)).cast("binary").as("value"),
      lit(topic).as("topic"),
      lit(0).as("partition"),
      monotonically_increasing_id().as("offset"),
      current_timestamp().as("timestamp"),
      lit(0).as("timestampType"))
}
