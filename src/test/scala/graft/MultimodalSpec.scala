package graft

import org.apache.spark.sql.functions.{count, lit}

import graft.operators.Multimodal
import graft.sources.TableIO

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fromDocuments(TableIO.table(spark, Sf0001, "documents"))

  test("binary plumbing: metaStats sizes/digests match partition-local extract") {
    val meta = Multimodal.metaStats(media).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getString(3))).toMap
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == meta.size)
    feats.foreach { f =>
      val (bytes, sha) = meta(f.media_id)
      assert(f.n_bytes == bytes)
      assert(f.sha256 == sha, "column-expr sha2 and mapPartitions digest must agree")
      assert(f.embedding.length == 8)
      assert(f.width >= 16 && f.height >= 16 && f.n_frames == 1)
    }
  }

  test("stub decode is deterministic") {
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.media_id).map(_.embedding.toSeq)
    val b = Multimodal.extractFeatures(media).collect().sortBy(_.media_id).map(_.embedding.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("resize replaces content deterministically and scales byte budget") {
    val media = graft.operators.Multimodal.fromDocuments(
      graft.sources.TableIO.table(spark, Sf0001, "documents").limit(20))
    val r1 = graft.operators.Multimodal.resize(media, 64, 64)
      .collect().map(r => r.media_id -> r.content.toSeq).toMap
    val r2 = graft.operators.Multimodal.resize(media, 64, 64)
      .collect().map(r => r.media_id -> r.content.toSeq).toMap
    assert(r1 == r2, "resize must be deterministic")
    val big = graft.operators.Multimodal.resize(media, 256, 256)
      .collect().map(r => r.media_id -> r.content.length).toMap
    assert(big.values.forall(n => n > r1.values.head.size))
  }

  test("frameSample emits every stride-th frame up to maxFrames, one row per frame") {
    import spark.implicits._
    val media = Seq(
      graft.operators.MediaRecord(1L, "video", "some video bytes".getBytes, "s"),
      graft.operators.MediaRecord(2L, "text", "plain text".getBytes, "s"))
      .toDS().toDF()
    val sampled = graft.operators.Multimodal.frameSample(media, stride = 2, maxFrames = 5)
    val byId = sampled.collect()
      .groupBy(_.getAs[Long]("media_id"))
      .view.mapValues(_.map(_.getAs[Int]("frame_idx")).sorted.toSeq).toMap
    // text: one frame -> [0]; video: frames 0,2,4,... capped at 5 samples
    assert(byId(2L) == Seq(0))
    val vidFrames = byId(1L)
    assert(vidFrames.head == 0 && vidFrames.size <= 5)
    assert(vidFrames.zip(vidFrames.tail).forall { case (a, b) => b - a == 2 })
  }

  test("frameSample drops 0-frame media instead of failing, rejects bad stride") {
    import spark.implicits._
    object ZeroFrameDecoder extends graft.operators.MediaDecoder {
      override def decode(m: String, c: Array[Byte]): (Int, Int, Int, Array[Float]) =
        if (m == "video") (0, 0, 0, Array.empty) else (16, 16, 1, Array.empty)
      override def resize(m: String, c: Array[Byte], w: Int, h: Int): Array[Byte] = c
    }
    val media = Seq(
      graft.operators.MediaRecord(1L, "video", "corrupt".getBytes, "s"),
      graft.operators.MediaRecord(2L, "text", "fine".getBytes, "s"))
      .toDS().toDF()
    val rows = graft.operators.Multimodal
      .frameSample(media, stride = 2, maxFrames = 5, decoder = ZeroFrameDecoder)
      .collect()
    assert(rows.map(_.getAs[Long]("media_id")).toSeq == Seq(2L))
    intercept[IllegalArgumentException] {
      graft.operators.Multimodal.frameSample(media, stride = 0, maxFrames = 5)
    }
  }

  /** A real PNG rendered in-test: left half red, right half blue. */
  private def halfToneImage(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try {
      g2.setColor(java.awt.Color.RED)
      g2.fillRect(0, 0, w / 2, h)
      g2.setColor(java.awt.Color.BLUE)
      g2.fillRect(w / 2, 0, w - w / 2, h)
    } finally g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder decodes real PNG bytes: dims, frames, pixel-derived features") {
    import spark.implicits._
    val media = Seq(
      graft.operators.MediaRecord(1L, "image", halfToneImage(80, 40), "s"),
      graft.operators.MediaRecord(2L, "image", "not an image".getBytes, "s"))
      .toDS().toDF()
    val feats = graft.operators.Multimodal
      .extractFeatures(media, graft.operators.ImageIoDecoder)
      .collect().map(f => f.media_id -> f).toMap
    val ok = feats(1L)
    assert(ok.width == 80 && ok.height == 40 && ok.n_frames == 1)
    assert(ok.embedding.length == 8)
    // PNG is lossless: half red + half blue on the sample grid.
    assert(math.abs(ok.embedding(0) - 0.5f) < 0.02f, s"mean R ${ok.embedding(0)}")
    assert(math.abs(ok.embedding(1)) < 0.02f, s"mean G ${ok.embedding(1)}")
    assert(math.abs(ok.embedding(2) - 0.5f) < 0.02f, s"mean B ${ok.embedding(2)}")
    // Quadrant luma: left quadrants are red (0.299), right are blue (0.114).
    assert(math.abs(ok.embedding(3) - 0.299f) < 0.02f, "top-left luma")
    assert(math.abs(ok.embedding(4) - 0.114f) < 0.02f, "top-right luma")
    assert(math.abs(ok.embedding(7) - 2.0f) < 1e-6f, "aspect ratio")
    // Undecodable image bytes: 0 frames (corrupt-media convention), not a crash.
    val bad = feats(2L)
    assert(bad.width == 0 && bad.height == 0 && bad.n_frames == 0)
    assert(bad.embedding.isEmpty)
    // And frameSample drops the corrupt row.
    val sampled = graft.operators.Multimodal
      .frameSample(media, stride = 1, maxFrames = 3, decoder = graft.operators.ImageIoDecoder)
      .collect().map(_.getAs[Long]("media_id")).toSeq
    assert(sampled == Seq(1L))
  }

  test("ImageIoDecoder resize re-encodes real pixels at the target dims") {
    import spark.implicits._
    val media = Seq(
      graft.operators.MediaRecord(1L, "image", halfToneImage(80, 40), "s"))
      .toDS().toDF()
    val resized = graft.operators.Multimodal
      .resize(media, 32, 16, graft.operators.ImageIoDecoder)
      .collect().head
    val (w, h, frames, emb) =
      graft.operators.ImageIoDecoder.decode("image", resized.content)
    assert(w == 32 && h == 16 && frames == 1)
    // Content survives the scale: still half red, half blue.
    assert(math.abs(emb(0) - 0.5f) < 0.05f && math.abs(emb(2) - 0.5f) < 0.05f)
  }

  /** A real 16-bit mono PCM WAV rendered in-test: `seconds` of audio at
    * `rate` Hz, silent for the first half, a 440 Hz sine at `amp` for
    * the second half.
    */
  private def halfSilentWav(rate: Int, seconds: Double, amp: Double): Array[Byte] = {
    val n = (rate * seconds).toInt
    val samples = Array.tabulate(n) { i =>
      if (i < n / 2) 0.0
      else amp * math.sin(2 * math.Pi * 440.0 * i / rate)
    }
    val bytes = new Array[Byte](n * 2)
    samples.zipWithIndex.foreach { case (x, i) =>
      val s = math.round(x * 32767).toShort
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, 1, 2, rate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("JavaSoundDecoder decodes real WAV bytes: format, duration, window energies") {
    import spark.implicits._
    val wav = halfSilentWav(rate = 8000, seconds = 1.0, amp = 0.5)
    val media = Seq(
      graft.operators.MediaRecord(1L, "audio", wav, "s"),
      graft.operators.MediaRecord(2L, "audio", "not audio".getBytes, "s"))
      .toDS().toDF()
    val feats = graft.operators.Multimodal.extractAudioFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    val ok = feats(1L)
    assert(ok.sample_rate == 8000 && ok.channels == 1 && ok.n_frames == 8000)
    assert(math.abs(ok.duration_s - 1.0) < 1e-6)
    // First half silent, second half a 0.5-amplitude sine: windows 0-3
    // near zero, windows 4-7 near 0.5/sqrt(2), overall rms = that /sqrt(2).
    assert(ok.embedding.length == 8)
    val sineRms = 0.5 / math.sqrt(2)
    ok.embedding.take(4).foreach(e => assert(e < 0.01, s"silent window $e"))
    ok.embedding.drop(4).foreach(e =>
      assert(math.abs(e - sineRms) < 0.01, s"sine window $e vs $sineRms"))
    assert(math.abs(ok.rms - sineRms / math.sqrt(2)) < 0.01)
    // Undecodable bytes: zeroed row, not a crash.
    val bad = feats(2L)
    assert(bad.sample_rate == 0 && bad.n_frames == 0L && bad.embedding.isEmpty)
  }

  test("synthWavPcm16Mono: encode -> JavaSoundDecoder decode recovers every sample") {
    // exact sample recovery: RMS of a CONSTANT signal equals |v|/32768
    // with zero float slack, and frame/rate metadata round-trips
    val v: Short = 12288 // 0.375 * 32768
    val const = graft.operators.Multimodal.synthWavPcm16Mono(
      16000, Array.fill(800)(v))
    val info = graft.operators.JavaSoundDecoder.decode(const, windows = 4).get
    assert(info.sampleRate == 16000 && info.channels == 1 && info.frames == 800L)
    assert(math.abs(info.rms - 0.375) < 1e-9)
    info.windowRms.foreach(w => assert(math.abs(w - 0.375f) < 1e-6f))
    // alternating +A/-A: same RMS, and an odd frame count exercises the
    // uneven window split (f0/f1 = frames*w/windows integer floors)
    val alt = Array.tabulate(801)(k => if (k % 2 == 0) v else (-v).toShort)
    val altWav = graft.operators.Multimodal.synthWavPcm16Mono(8000, alt)
    val i2 = graft.operators.JavaSoundDecoder.decode(altWav, windows = 4).get
    assert(i2.frames == 801L && math.abs(i2.rms - 0.375) < 1e-9)
    // byte-level contract: 44-byte RIFF header + 2 bytes per sample
    assert(const.length == 44 + 1600 && altWav.length == 44 + 1602)
  }

  test("synthPngRgb: encode -> ImageIoDecoder recovers every pixel statistic exactly") {
    // Lossless contract: PNG INT_RGB round-trips pixels bit-exactly, so
    // the 8-dim feature equals the analytic value with NO slack beyond
    // the decoder's own float32 cast. Quadrant-constant image: each
    // quadrant one known color.
    val colors = Array(
      (255, 0, 0),   // TL pure red
      (0, 255, 0),   // TR pure green
      (0, 0, 255),   // BL pure blue
      (255, 255, 255)) // BR white
    val png = graft.operators.Multimodal.synthPngRgb(8, 8, (x, y) => {
      val q = (if (y >= 4) 2 else 0) + (if (x >= 4) 1 else 0)
      val (r, g, b) = colors(q)
      (r << 16) | (g << 8) | b
    })
    val (w, h, f, emb) = graft.operators.ImageIoDecoder.decode("image", png)
    assert((w, h, f) == ((8, 8, 1)))
    // mean RGB: each channel fully on in exactly the quadrants listed.
    assert(math.abs(emb(0) - (255.0 * 32 / 64 / 255.0)) < 1e-7, "R in TL+BR")
    assert(math.abs(emb(1) - (255.0 * 32 / 64 / 255.0)) < 1e-7, "G in TR+BR")
    assert(math.abs(emb(2) - (255.0 * 32 / 64 / 255.0)) < 1e-7, "B in BL+BR")
    // quadrant lumas: the ITU coefficients of each pure color.
    assert(math.abs(emb(3) - 0.299f) < 1e-6)
    assert(math.abs(emb(4) - 0.587f) < 1e-6)
    assert(math.abs(emb(5) - 0.114f) < 1e-6)
    assert(math.abs(emb(6) - 1.0f) < 1e-6)
    assert(emb(7) == 1.0f)
    // determinism: identical render -> identical bytes -> identical features
    val png2 = graft.operators.Multimodal.synthPngRgb(8, 8, (x, y) => {
      val q = (if (y >= 4) 2 else 0) + (if (x >= 4) 1 else 0)
      val (r, g, b) = colors(q)
      (r << 16) | (g << 8) | b
    })
    val again = graft.operators.ImageIoDecoder.decode("image", png2)._4
    assert(again.toSeq == emb.toSeq)
  }

  test("ImageIoDecoder delegates non-image modalities to the stub") {
    val bytes = "some audio bytes".getBytes
    val (aw, ah, af, aEmb) = graft.operators.ImageIoDecoder.decode("audio", bytes)
    val (sw, sh, sf, sEmb) = graft.operators.StubDecoder.decode("audio", bytes)
    assert((aw, ah, af) == ((sw, sh, sf)) && aEmb.toSeq == sEmb.toSeq)
  }

  test("sceneManifest: hand-placed boundaries, keyframe = scene start") {
    import spark.implicits._
    // video 1: jumps at idx 2 and 4 -> scenes {0,1}, {2,3}, {4}
    // video 2: flat -> one scene
    val frames = Seq(
      (1L, 0L, Seq(0.0)), (1L, 1L, Seq(10.0)), (1L, 2L, Seq(200.0)),
      (1L, 3L, Seq(210.0)), (1L, 4L, Seq(5.0)),
      (2L, 0L, Seq(50.0)), (2L, 1L, Seq(60.0))
    ).toDF("video_id", "frame_idx", "feat")
    val got = Multimodal.sceneManifest(frames, "video_id", "frame_idx", "feat", 90.0)
      .orderBy("video_id", "scene_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 1L, 2L, 0L),
      (1L, 1L, 2L, 3L, 2L, 2L),
      (1L, 2L, 4L, 4L, 1L, 4L),
      (2L, 0L, 0L, 1L, 2L, 0L)))
  }

  test("sceneManifest: L2 over dims composes — no dim alone crosses, the norm does") {
    import spark.implicits._
    // per-dim delta 70 < 90 but L2 = 70*sqrt(2) ~= 99 > 90 -> boundary
    val frames = Seq(
      (1L, 0L, Seq(0.0, 0.0)), (1L, 1L, Seq(70.0, 70.0)), (1L, 2L, Seq(70.0, 71.0))
    ).toDF("video_id", "frame_idx", "feat")
    val scenes = Multimodal.sceneManifest(frames, "video_id", "frame_idx", "feat", 90.0)
      .orderBy("scene_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(scenes == Seq((0L, 0L, 0L), (1L, 1L, 2L)))
  }

  test("sceneManifestAdaptive: one config segments calm and shaky clips sensibly") {
    import spark.implicits._
    // calm clip: tiny jitter (±1) except two REAL cuts of 10
    val calm = Seq(0.0, 1.0, 0.0, 1.0, 11.0, 12.0, 11.0, 12.0, 22.0, 23.0)
      .zipWithIndex.map { case (v, i) => (1L, i, Array(v)) }
    // shaky clip: constant jitter of 20 except two real cuts of 200
    val shaky = Seq(0.0, 20.0, 0.0, 20.0, 220.0, 240.0, 220.0, 240.0, 440.0, 460.0)
      .zipWithIndex.map { case (v, i) => (2L, i, Array(v)) }
    val frames = (calm ++ shaky).toDF("video_id", "frame_idx", "feat")
    val scenes = graft.operators.Multimodal
      .sceneManifestAdaptive(frames, "video_id", "frame_idx", "feat", quantile = 0.7)
      .select("video_id", "scene_idx", "start_frame", "end_frame")
      .as[(Long, Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(s => (s._3, s._4)).toSeq).toMap
    // both clips: exactly 3 scenes, cut at their own big transitions
    // (9 dists each, k = ceil(0.7*9) = 7 -> threshold = the jitter level
    // itself; only the two real cuts strictly exceed it)
    assert(scenes(1L) == Seq((0, 3), (4, 7), (8, 9)), s"calm: ${scenes(1L)}")
    assert(scenes(2L) == Seq((0, 3), (4, 7), (8, 9)), s"shaky: ${scenes(2L)}")
    // a FIXED threshold cannot do this: any global value either cuts the
    // shaky clip's jitter (th < 20) or misses the calm clip's cuts (th >= 10)
    val fixed = graft.operators.Multimodal
      .sceneManifest(frames, "video_id", "frame_idx", "feat", threshold = 15.0)
      .groupBy("video_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(fixed(1L) == 1L && fixed(2L) == 10L,
      s"fixed threshold should fail one side: $fixed")
    // minThreshold floors a static clip (all-zero motion cuts nothing)
    val static = (0 to 5).map(i => (3L, i, Array(0.0))).toDF("video_id", "frame_idx", "feat")
    val flat = graft.operators.Multimodal
      .sceneManifestAdaptive(static, "video_id", "frame_idx", "feat",
        quantile = 0.8, minThreshold = 0.5)
      .count()
    assert(flat == 1L, "static clip must stay one scene under the floor")
  }

  test("sceneManifest: scene indexes are contiguous and frames partition exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = TableIO.table(spark, Sf0001, "documents")
    val frames = docs.select(
        col("doc_id").as("video_id"),
        explode(sequence(lit(0), (pmod(col("n_chars"), lit(7)) + 3).cast("int")))
          .as("frame_idx0"))
      .withColumn("frame_idx", col("frame_idx0").cast("long"))
      .drop("frame_idx0")
      .withColumn("bright",
        conv(substring(md5(concat(col("video_id"), lit("_"), col("frame_idx"))), 1, 2),
          16, 10).cast("double"))
      .withColumn("feat", array(col("bright")))
    val scenes = Multimodal
      .sceneManifest(frames, "video_id", "frame_idx", "feat", 90.0).cache()
    val perVideo = scenes.groupBy("video_id")
      .agg(count(lit(1)).as("n_scenes"), max(col("scene_idx")).as("max_idx"),
        sum(col("n_frames")).as("covered"), min(col("start_frame")).as("first"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val frameCounts = frames.groupBy("video_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVideo.keySet == frameCounts.keySet)
    for ((v, (nScenes, maxIdx, covered, first)) <- perVideo) {
      assert(maxIdx == nScenes - 1, s"video $v scene ids not contiguous")
      assert(covered == frameCounts(v), s"video $v frames not partitioned")
      assert(first == 0L, s"video $v first scene must start at frame 0")
    }
    // spans are disjoint and ordered: start of scene i+1 = end of scene i + 1
    val rows = scenes.orderBy("video_id", "scene_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.sliding(2).foreach {
      case Array((v1, _, _, e1), (v2, _, s2, _)) if v1 == v2 =>
        assert(s2 == e1 + 1, s"video $v1 spans not contiguous")
      case _ => ()
    }
    scenes.unpersist()
    ()
  }
}
