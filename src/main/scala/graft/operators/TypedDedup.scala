package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed (`Dataset[T]`) exact-dedup digest — the compile-time-safe
  * counterpart of [[Dedup.exactDuplicateGroups]] for case-class pipelines.
  *
  * The digest is an `Aggregator` (deterministic min-id keeper + copy
  * count), so Spark runs it as a regular partial aggregation: map-side
  * combine reduces each partition to one tiny buffer per group before the
  * shuffle, exactly like the untyped `min`/`count` form — no
  * `groupByKey(...).mapGroups` full-group materialization anywhere.
  */
final case class DedupDigest(keeper_id: Long, n_copies: Long)

object TypedDedup {

  /** (min id, count) digest over a group; commutative + associative so
    * partial buffers merge in any order.
    */
  final class ExactDedupAgg[T](id: T => Long)
      extends Aggregator[T, DedupDigest, DedupDigest] with Serializable {
    override def zero: DedupDigest = DedupDigest(Long.MaxValue, 0L)
    override def reduce(b: DedupDigest, row: T): DedupDigest =
      DedupDigest(math.min(b.keeper_id, id(row)), b.n_copies + 1L)
    override def merge(x: DedupDigest, y: DedupDigest): DedupDigest =
      DedupDigest(math.min(x.keeper_id, y.keeper_id), x.n_copies + y.n_copies)
    override def finish(r: DedupDigest): DedupDigest = r
    override def bufferEncoder: Encoder[DedupDigest] = Encoders.product[DedupDigest]
    override def outputEncoder: Encoder[DedupDigest] = Encoders.product[DedupDigest]
  }

  /** Lower-case hex md5 — same formatting as Spark's and DuckDB's `md5`. */
  def md5Hex(text: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(text.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(d.length * 2)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Exact duplicate groups over a typed Dataset: one row per distinct
    * content key with the deterministic keeper id and copy count. Output
    * schema matches [[Dedup.exactDuplicateGroups]]:
    * (content_hash, keeper_id, n_copies).
    */
  def exactDuplicateGroups[T](
      ds: Dataset[T],
      contentKey: T => String,
      id: T => Long): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(contentKey)
      .agg(new ExactDedupAgg[T](id).toColumn.name("digest"))
      .select(
        org.apache.spark.sql.functions.col("key").as("content_hash"),
        org.apache.spark.sql.functions.col("digest.keeper_id").as("keeper_id"),
        org.apache.spark.sql.functions.col("digest.n_copies").as("n_copies"))
  }
}
