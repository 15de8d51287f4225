package graft

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
}
