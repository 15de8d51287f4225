package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * runs partition-local behind a pluggable decoder.
  *
  * Two decoders ship behind the `MediaDecoder` trait:
  * [[ImageIoDecoder]] decodes REAL image bytes (PNG/JPEG/GIF/BMP) via
  * the JDK's `javax.imageio`; [[StubDecoder]] produces a deterministic
  * fake from the content bytes for modalities with no JDK codec
  * (audio/video) and for the reproducible oracle path — the Spark-side
  * plumbing (schema, binary batching, partition-local execution,
  * feature schema) is identical either way.
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

final case class AudioFeatures(
    media_id: Long,
    modality: String,
    n_bytes: Int,
    sample_rate: Int,
    channels: Int,
    n_frames: Long,
    duration_s: Double,
    rms: Double,
    embedding: Array[Float])

/** Decoded audio payload: format metadata plus amplitude statistics
  * (overall RMS in [0, 1] and RMS over `windows` equal time slices —
  * a crude but real spectral-envelope-free audio fingerprint).
  */
final case class AudioInfo(
    sampleRate: Int,
    channels: Int,
    frames: Long,
    durationSeconds: Double,
    rms: Double,
    windowRms: Array[Float])

trait AudioDecoder extends Serializable {
  /** None = bytes this decoder cannot parse (corrupt/unsupported). */
  def decode(content: Array[Byte], windows: Int): Option[AudioInfo]
}

/** REAL audio codec over the JDK's `javax.sound.sampled` (WAV/AIFF/AU
  * — no external jars): parses actual PCM frames for sample rate,
  * channel count, frame count, duration, and per-window RMS energy.
  * Compressed formats (MP3/OGG/FLAC) have no JDK codec and return
  * None — the corrupt-media convention again, so one undecodable
  * payload never fails a corpus-wide job.
  */
object JavaSoundDecoder extends AudioDecoder {
  override def decode(content: Array[Byte], windows: Int): Option[AudioInfo] = {
    require(windows >= 1, s"windows must be >= 1, got $windows")
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val srcFmt = raw.getFormat
        // Normalize to signed 16-bit PCM at the source rate/channels so
        // the amplitude math below is format-independent.
        val pcmFmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          srcFmt.getSampleRate, 16, srcFmt.getChannels,
          srcFmt.getChannels * 2, srcFmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, raw)
        try {
          val bytes = pcm.readAllBytes()
          val channels = pcmFmt.getChannels
          val frameBytes = channels * 2
          val frames = bytes.length.toLong / frameBytes
          val winRms = new Array[Float](windows)
          var rmsAcc = 0.0
          var w = 0
          while (w < windows) {
            val f0 = frames * w / windows
            val f1 = frames * (w + 1) / windows
            var acc = 0.0
            var f = f0
            while (f < f1) {
              var c = 0
              while (c < channels) {
                val off = (f * frameBytes + c * 2).toInt
                // little-endian signed 16-bit
                val s = ((bytes(off + 1).toInt << 8) | (bytes(off) & 0xff)).toShort
                val x = s / 32768.0
                acc += x * x
                c += 1
              }
              f += 1
            }
            val n = (f1 - f0) * channels
            winRms(w) = (if (n > 0) math.sqrt(acc / n) else 0.0).toFloat
            rmsAcc += acc
            w += 1
          }
          val total = frames * channels
          val sr = math.round(pcmFmt.getSampleRate)
          Some(AudioInfo(
            sr, channels, frames,
            if (sr > 0) frames.toDouble / sr else 0.0,
            if (total > 0) math.sqrt(rmsAcc / total) else 0.0,
            winRms))
        } finally pcm.close()
      } finally raw.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }
}

/** REAL image codec over the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP —
  * no external jars): decodes actual pixels for dimensions, frame count
  * (multi-frame GIF via `getNumImages`), and an 8-dim content feature
  * (mean R/G/B, per-quadrant mean luma, aspect ratio). Non-image
  * modalities delegate to [[StubDecoder]] (no audio/video codec ships
  * with the JDK); undecodable image bytes report 0 frames — the
  * corrupt-media convention [[Multimodal.frameSample]] already
  * tolerates — rather than failing a 100 TB job on one bad payload.
  */
object ImageIoDecoder extends MediaDecoder {
  // ImageIO's default disk cache writes temp files per decode; executors
  // decode in tight loops over in-memory byte arrays, so cache in heap.
  javax.imageio.ImageIO.setUseCache(false)

  /** Feature grid resolution: pixel stats are sampled on at most this
    * many points per axis, so feature cost is bounded for arbitrarily
    * large images (a 100-megapixel scan costs the same as a thumbnail).
    */
  private val SampleGrid = 64

  private def withReader[A](content: Array[Byte])(
      f: javax.imageio.ImageReader => A): Option[A] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        // seekForwardOnly=false: getNumImages(true) must scan the stream.
        reader.setInput(iis, false, true)
        try Some(f(reader))
        finally reader.dispose()
      }
    } catch { case _: java.io.IOException => None }
    finally iis.close()
  }

  override def decode(modality: String, content: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    if (modality != "image") return StubDecoder.decode(modality, content)
    withReader(content) { reader =>
      val frames =
        try reader.getNumImages(true)
        catch { case _: java.io.IOException => 1 }
      val img = reader.read(0)
      val w = img.getWidth
      val h = img.getHeight
      // Bounded-cost pixel stats on a <= SampleGrid^2 lattice.
      val gx = math.min(w, SampleGrid)
      val gy = math.min(h, SampleGrid)
      var sr, sg, sb = 0.0
      // Quadrant luma sums (top-left, top-right, bottom-left, bottom-right).
      val ql = new Array[Double](4)
      val qn = new Array[Long](4)
      var iy = 0
      while (iy < gy) {
        val y = (iy.toLong * h / gy).toInt
        var ix = 0
        while (ix < gx) {
          val x = (ix.toLong * w / gx).toInt
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val q = (if (y >= h / 2) 2 else 0) + (if (x >= w / 2) 1 else 0)
          ql(q) += 0.299 * r + 0.587 * g + 0.114 * b
          qn(q) += 1
          ix += 1
        }
        iy += 1
      }
      val n = (gx.toLong * gy).toDouble
      val emb = Array(
        (sr / n / 255.0).toFloat,
        (sg / n / 255.0).toFloat,
        (sb / n / 255.0).toFloat,
        (if (qn(0) > 0) ql(0) / qn(0) / 255.0 else 0.0).toFloat,
        (if (qn(1) > 0) ql(1) / qn(1) / 255.0 else 0.0).toFloat,
        (if (qn(2) > 0) ql(2) / qn(2) / 255.0 else 0.0).toFloat,
        (if (qn(3) > 0) ql(3) / qn(3) / 255.0 else 0.0).toFloat,
        (w.toDouble / math.max(1, h)).toFloat)
      (w, h, frames, emb)
    }.getOrElse((0, 0, 0, Array.empty[Float]))
  }

  override def resize(modality: String, content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (modality != "image") return StubDecoder.resize(modality, content, w, h)
    withReader(content)(_.read(0)) match {
      case None => content // undecodable: pass through, decode reports 0 frames
      case Some(src) =>
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        try {
          g2.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(src, 0, 0, w, h, null)
        } finally g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
    }
  }
}

object Multimodal {

  /** Minimal RIFF/WAVE encoder for 16-bit signed mono PCM — the
    * deterministic byte-level inverse of what [[JavaSoundDecoder]]
    * parses. Exists so contract queries and specs can synthesize REAL
    * WAV payloads from pure functions of the row (md5-derived samples)
    * and pin the whole encode→decode→feature path against an analytic
    * oracle; production audio arrives as bytes from storage.
    */
  def synthWavPcm16Mono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataBytes = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                   // PCM
      .putShort(1)                   // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)        // byte rate
      .putShort(2)                   // block align
      .putShort(16)                  // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Synthesize a REAL PNG from a per-pixel RGB function via the JDK
    * encoder — the image counterpart of [[synthWavPcm16Mono]]: PNG is
    * LOSSLESS for TYPE_INT_RGB, so [[ImageIoDecoder]] reads back the
    * exact rendered pixels and the whole encode→decode→feature path
    * carries an ANALYTIC oracle (the SQL replays the pixel formula and
    * the lattice statistics, never the bytes). Production images arrive
    * as bytes from storage; this exists for contract queries and specs.
    */
  def synthPngRgb(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    require(w >= 1 && h >= 1, s"degenerate image ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

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

  /** Partition-local AUDIO decode + feature extraction — the audio
    * counterpart of [[extractFeatures]], with an honest audio schema
    * (sample rate / channels / PCM frames / duration / RMS + an
    * 8-window energy envelope) instead of image-shaped fields.
    * Undecodable payloads yield a zeroed row (sample_rate = 0, empty
    * embedding) rather than failing the job — filter `sample_rate > 0`
    * downstream for the decoded slice.
    */
  def extractAudioFeatures(
      media: DataFrame,
      decoder: AudioDecoder = JavaSoundDecoder,
      windows: Int = 8): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        decoder.decode(rec.content, windows) match {
          case Some(a) =>
            AudioFeatures(rec.media_id, rec.modality, rec.content.length,
              a.sampleRate, a.channels, a.frames, a.durationSeconds, a.rms,
              a.windowRms)
          case None =>
            AudioFeatures(rec.media_id, rec.modality, rec.content.length,
              0, 0, 0L, 0.0, 0.0, Array.empty[Float])
        }
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

  /** Scene segmentation over a PRE-EXTRACTED frames table — the shape
    * video work actually takes at 100 TB: container parsing runs on a
    * decode fleet (JDK-impossible here, see SURVEY §"round-12
    * candidates" (b)), which lands a (video, frame_idx, feature-vector)
    * table; everything downstream is plain columnar work this engine
    * CAN own. A scene boundary is a frame whose L2 feature distance to
    * the previous frame exceeds `threshold`; scenes are the
    * gaps-and-islands between boundaries, and the manifest keeps one
    * keyframe per scene (the first frame — deterministic, and the
    * frame a captioning stage would fetch).
    *
    * Output: (video, scene_idx, start_frame, end_frame, n_frames,
    * keyframe_idx), scene_idx 0-based per video in frame order.
    *
    * Scale shape: one window keyed by video (state bounded by a single
    * video's frame count) and one groupBy on (video, scene) — no
    * shuffle wider than the frames table, no driver state. The L2
    * distance is a codegen'd `zip_with`/`aggregate` fold, no UDF.
    *
    * Convention: a frame whose feature vector is null or whose length
    * differs from its predecessor's yields a null distance, which is
    * NOT a boundary (the null-safe `when` falls through) — degraded
    * frames extend the current scene rather than fragmenting the
    * manifest.
    */
  def sceneManifest(
      frames: DataFrame,
      videoCol: String,
      idxCol: String,
      featCol: String,
      threshold: Double): DataFrame = {
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(videoCol)).orderBy(col(idxCol))
    val d2 = aggregate(
      zip_with(col(featCol), col("__prev"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    frames
      .withColumn("__prev", lag(col(featCol), 1).over(w))
      .withColumn("__brk",
        when(col("__prev").isNull || sqrt(d2) > threshold, 1L).otherwise(0L))
      .withColumn("scene_idx", sum(col("__brk")).over(w) - 1L)
      .groupBy(col(videoCol), col("scene_idx"))
      .agg(
        min(col(idxCol)).as("start_frame"),
        max(col(idxCol)).as("end_frame"),
        count(lit(1)).as("n_frames"))
      .withColumn("keyframe_idx", col("start_frame"))
  }

  /** [[sceneManifest]] with a PER-VIDEO adaptive threshold: real footage
    * varies — a fixed cut distance over-segments shaky handheld clips
    * and under-segments static interviews under one config. Here each
    * video's threshold is the k-th smallest of its own inter-frame
    * distances, k = ceil(quantile * n_distances): a boundary is a
    * transition in the video's own top (1 - quantile) tail, floored by
    * `minThreshold` so a genuinely static clip doesn't cut on noise.
    *
    * The k-th ORDER STATISTIC (not an interpolated percentile) is
    * deliberate: it is a value the data actually contains, reproducible
    * bit-for-bit across engines — `ceil(q * n)` is one IEEE multiply in
    * every engine — which keeps the operator full-oracle-checkable
    * (q_frames_scenes_adaptive) where `percentile`'s interpolation
    * conventions would not be.
    *
    * Scale shape adds one rank window + one count window over the
    * distance rows (both keyed by video, same bound as the manifest
    * windows) and a per-video threshold join the optimizer broadcasts.
    * Null/mismatched feature rows keep the fixed mode's convention:
    * excluded from the rank, never a boundary.
    */
  def sceneManifestAdaptive(
      frames: DataFrame,
      videoCol: String,
      idxCol: String,
      featCol: String,
      quantile: Double,
      minThreshold: Double = 0.0): DataFrame = {
    require(quantile > 0 && quantile < 1, s"quantile must be in (0,1), got $quantile")
    require(minThreshold >= 0, s"minThreshold must be >= 0, got $minThreshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(videoCol)).orderBy(col(idxCol))
    val byVideo = org.apache.spark.sql.expressions.Window.partitionBy(col(videoCol))
    val d2 = aggregate(
      zip_with(col(featCol), col("__prev"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val withDist = frames
      .withColumn("__prev", lag(col(featCol), 1).over(w))
      .withColumn("__dist", sqrt(d2))
    val thr = withDist.where(col("__dist").isNotNull)
      .select(col(videoCol), col("__dist"))
      .withColumn("__rn", row_number().over(byVideo.orderBy(col("__dist"))))
      .withColumn("__n", count(lit(1)).over(byVideo))
      .where(col("__rn") === ceil(lit(quantile) * col("__n")))
      .select(col(videoCol), greatest(col("__dist"), lit(minThreshold)).as("__thr"))
    withDist
      .join(thr, Seq(videoCol), "left")
      .withColumn("__brk",
        when(col("__prev").isNull || col("__dist") > col("__thr"), 1L)
          .otherwise(0L))
      .withColumn("scene_idx", sum(col("__brk")).over(w) - 1L)
      .groupBy(col(videoCol), col("scene_idx"))
      .agg(
        min(col(idxCol)).as("start_frame"),
        max(col(idxCol)).as("end_frame"),
        count(lit(1)).as("n_frames"))
      .withColumn("keyframe_idx", col("start_frame"))
  }
}
