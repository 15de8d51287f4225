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
}
