package graft

import graft.multimodal.Binary

class BinarySpec extends SparkSpec {

  test("F1: media pipeline keeps schema, batch shape, and determinism") {
    val recs = Binary.mediaRecords(spark, Sf)
    val feats = Binary.extractFeatures(recs)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "feature"))
    val rows = feats.collect()
    assert(rows.length == recs.count())
    rows.foreach { f =>
      assert(f.feature.length == Binary.FeatureDim)
      // normalized histogram sums to ~1 for non-empty payloads
      assert(math.abs(f.feature.sum - 1.0) < 1e-9 || f.n_bytes == 0)
    }
    // deterministic across runs
    val again = Binary.extractFeatures(recs).collect()
    assert(rows.map(_.doc_id).sorted.sameElements(again.map(_.doc_id).sorted))
  }

  test("F2: frame sampling keeps stride, window bounds, and exact stats") {
    val payload = (0 until 1000).map(i => (i % 251).toByte).toArray
    val frames = Binary.sampleFrames(
      Binary.MediaRecord(7L, "video/fake", payload, "en", 1000L))
    // 1000 bytes -> frames 0..3 (256,256,256,232 bytes); stride 4 keeps frame 0
    assert(frames.map(_.frame_no) == Seq(0))
    assert(frames.head.frame_len == Binary.FrameBytes)
    assert(frames.head.sum_bytes == payload.take(256).map(b => (b & 0xFF).toLong).sum)
    // a 5-frame payload keeps frames 0 and 4, and the tail frame is short
    val long = Binary.sampleFrames(
      Binary.MediaRecord(8L, "video/fake", new Array[Byte](256 * 4 + 10), "en", 0L))
    assert(long.map(_.frame_no) == Seq(0, 4))
    assert(long.last.frame_len == 10)
  }

  test("decodeBatch is pure and batch-size independent") {
    val recs = Seq(
      Binary.MediaRecord(1L, "text/plain", "hello world".getBytes, "en", 11L),
      Binary.MediaRecord(2L, "text/plain", "abc".getBytes, "en", 3L))
    val one = Binary.decodeBatch(recs)
    val split = Binary.decodeBatch(recs.take(1)) ++ Binary.decodeBatch(recs.drop(1))
    assert(one.map(_.feature.toSeq) == split.map(_.feature.toSeq))
  }
}
