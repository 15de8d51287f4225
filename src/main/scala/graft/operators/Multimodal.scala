package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * runs partition-local behind a pluggable decoder.
  *
  * The decode step is STUBBED (no codec libraries in this environment):
  * `StubDecoder` produces a deterministic fake from the content bytes so
  * the Spark-side plumbing — schema, binary batching, partition-local
  * execution, feature schema — is real and testable. A deployment binds
  * a real codec behind the same `MediaDecoder` trait.
  */
final case class MediaRecord(
    media_id: Long,
    modality: String,
    content: Array[Byte],
    source: String)

final case class MediaFeatures(
    media_id: Long,
    modality: String,
    n_bytes: Int,
    sha256: String,
    width: Int,
    height: Int,
    n_frames: Int,
    embedding: Array[Float])

trait MediaDecoder extends Serializable {
  /** (width, height, frames, feature vector). */
  def decode(modality: String, content: Array[Byte]): (Int, Int, Int, Array[Float])

  /** Re-encode the payload at a target size. STUB contract: output is a
    * deterministic function of (content, w, h). A real codec decodes,
    * scales, re-encodes here.
    */
  def resize(modality: String, content: Array[Byte], w: Int, h: Int): Array[Byte]
}

/** STUB: deterministic fake decode derived from a content digest. A real
  * implementation would decode image/audio bytes here (libraries absent
  * in this container); everything around it is production-shaped.
  */
object StubDecoder extends MediaDecoder {
  // One digest instance per thread, not per row — decode runs in tight
  // partition loops.
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-256"))

  override def decode(modality: String, content: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val md = digests.get(); md.reset()
    val d = md.digest(content)
    def u8(i: Int): Int = d(i) & 0xff
    val width = 16 + u8(0) * 4
    val height = 16 + u8(1) * 4
    val frames = if (modality == "video") 1 + u8(2) % 64 else 1
    val emb = Array.tabulate(8)(i => (u8(i * 2) * 256 + u8(i * 2 + 1)) / 65535.0f)
    (width, height, frames, emb)
  }

  override def resize(modality: String, content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // Deterministic fake: digest of (content ++ dims), length scaled to
    // the pixel budget so downstream byte accounting is realistic.
    val md = MessageDigest.getInstance("SHA-256")
    md.update(content)
    md.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
    val seed = md.digest()
    val n = math.max(16, math.min(w * h / 8, 4096))
    Array.tabulate(n)(i => seed(i % seed.length))
  }
}

object Multimodal {

  /** Wrap the documents table as a media table (text payload as bytes) —
    * exercises the binary-column path end to end with real data.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text").as("modality"),
      col("text").cast("binary").as("content"),
      col("source"))

  /** Metadata pass that never leaves Catalyst: byte size + content digest.
    * Cheap full-corpus integrity/accounting scan.
    */
  def metaStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("modality"),
      octet_length(col("content")).as("n_bytes"),
      sha2(col("content"), 256).as("content_sha"))

  /** Partition-local decode + feature extraction. `mapPartitions` (not a
    * per-row UDF) so a real decoder can amortize codec init per partition
    * — the JVM analogue of a batched pandas UDF.
    */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val md = MessageDigest.getInstance("SHA-256")
      it.map { rec =>
        val (w, h, f, emb) = decoder.decode(rec.modality, rec.content)
        md.reset()
        val sha = md.digest(rec.content).map("%02x".format(_)).mkString
        MediaFeatures(rec.media_id, rec.modality, rec.content.length, sha, w, h, f, emb)
      }
    }
  }

  /** Partition-local resize: content replaced by the decoder's re-encoded
    * payload at (w, h). Same batched mapPartitions shape as
    * [[extractFeatures]] — codec init amortizes across the partition.
    */
  def resize(media: DataFrame, w: Int, h: Int, decoder: MediaDecoder = StubDecoder): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(rec => rec.copy(content = decoder.resize(rec.modality, rec.content, w, h)))
    }
  }

  /** Frame sampling plan for video rows: one output row per sampled frame
    * index (every `stride`-th frame, up to `maxFrames`), exploded
    * row-locally from the decoded frame count. Non-video modalities pass
    * through as frame 0. The (media_id, frame_idx) grain is what a
    * downstream per-frame decode/caption stage parallelizes over.
    */
  def frameSample(
      media: DataFrame,
      stride: Int,
      maxFrames: Int,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    require(stride > 0, s"frameSample stride must be positive, got $stride")
    require(maxFrames > 0, s"frameSample maxFrames must be positive, got $maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    val withFrames = media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        val (_, _, frames, _) = decoder.decode(rec.modality, rec.content)
        (rec.media_id, rec.modality, frames)
      }
    }.toDF("media_id", "modality", "n_frames")
    // A decoder may legitimately report 0 frames (corrupt media):
    // sequence(0, -1, stride) is a runtime error, so such rows yield no
    // frame rows rather than failing the whole job.
    withFrames.where(col("n_frames") > 0).select(
      col("media_id"), col("modality"), col("n_frames"),
      explode(sequence(
        lit(0),
        least(col("n_frames") - 1, lit((maxFrames - 1) * stride)),
        lit(stride))).as("frame_idx"))
  }
}
