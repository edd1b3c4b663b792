package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "some image payload"), (1L, "an audio payload"), (2L, "a video payload"))
    .toDF("doc_id", "text")

  test("attachPayloads builds the binary media schema with rotating mime") {
    val m = Multimodal.attachPayloads(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val mimes = m.select("doc_id", "mime").as[(Long, String)].collect().toMap
    assert(mimes == Map(0L -> "image/png", 1L -> "audio/wav", 2L -> "video/mp4"))
  }

  test("decodeFeatures is deterministic and byte-derived") {
    val f1 = Multimodal.decodeFeatures(Multimodal.attachPayloads(docs)).collect()
      .sortBy(_.doc_id)
    val f2 = Multimodal.decodeFeatures(Multimodal.attachPayloads(docs)).collect()
      .sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq) // deterministic
    assert(f1.forall(r => r.n_bytes > 0 && r.width >= 64 && r.height >= 64))
    assert(f1(0).duration_ms == 0L)       // images have no duration
    assert(f1(1).duration_ms >= 0L)
    // features derive from bytes: different payloads → different hashes
    assert(f1.map(_.feature_hash).distinct.length == 3)
  }

  test("resizePayloads contracts payloads to the byte budget and composes with decode") {
    val media = Multimodal.attachPayloads(docs)
    val resized = Multimodal.resizePayloads(media, maxBytes = 8)
    val rows = resized.collect().sortBy(_.doc_id)
    assert(rows.forall(r => r.payload.length <= 8 && r.payload.nonEmpty))
    assert(rows.forall(r => r.n_bytes == r.payload.length.toLong))
    // stages compose: resize → decode runs as one narrow chain
    val feats = Multimodal.decodeFeatures(resized.toDF()).collect()
    assert(feats.length == 3 && feats.map(_.feature_hash).distinct.length == 3)
  }

  test("a codec registered via config drops in with zero plumbing change") {
    try {
      // swap the stub for the fake "real" codec — config only, same
      // queries, same schemas
      spark.conf.set(Multimodal.CodecConfKey, classOf[FakeRealCodec].getName)
      val feats = Multimodal.decodeFeatures(Multimodal.attachPayloads(docs))
        .collect().sortBy(_.doc_id)
      assert(feats.forall(f => f.width == 42 && f.height == 24 && f.feature_hash == 7L))
      assert(feats.map(_.doc_id).toSeq == Seq(0L, 1L, 2L)) // alignment intact
      val frames = Multimodal.sampleFrames(Multimodal.attachPayloads(docs)).collect()
      assert(frames.length == 3 && frames.forall(_.frame_hash == 7L))
    } finally spark.conf.unset(Multimodal.CodecConfKey)
    // back on the default stub after unset
    val stub = Multimodal.decodeFeatures(Multimodal.attachPayloads(docs)).collect()
    assert(stub.exists(_.feature_hash != 7L))
  }

  test("codec batching honors the configured batch size and keeps columns aligned") {
    val many = (0L until 100L).map(i => (i, s"payload number $i"))
      .toDF("doc_id", "text")
    val expected = Multimodal.decodeFeatures(Multimodal.attachPayloads(many))
      .collect().sortBy(_.doc_id).toSeq
    try {
      spark.conf.set(Multimodal.BatchSizeConfKey, "7") // forces ragged final batches
      val batched = Multimodal.decodeFeatures(Multimodal.attachPayloads(many))
        .collect().sortBy(_.doc_id).toSeq
      assert(batched == expected)
    } finally spark.conf.unset(Multimodal.BatchSizeConfKey)
  }

  test("sampleFrames expands videos into per-chunk frame rows, passes others through") {
    val media = Multimodal.attachPayloads(docs)
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, everyMs = 500L)
      .collect().groupBy(_.doc_id)
    assert(frames(0L).length == 1 && frames(1L).length == 1) // image/audio: 1 row
    val video = frames(2L).sortBy(_.frame_idx)
    val payloadLen = "a video payload".length
    assert(video.length == (payloadLen + 3) / 4) // one frame per 4-byte chunk
    assert(video.map(_.ts_ms).toSeq == video.indices.map(_ * 500L))
    assert(video.init.forall(_.n_bytes == 4L))
    // deterministic chunk hashes, all distinct here
    assert(video.map(_.frame_hash).distinct.length == video.length)
  }
}

/** Stand-in for a real cluster codec: constant features prove the
  * config-registered class (not the stub) handled the batch. No-arg
  * constructible, like any codec the contract admits.
  */
final class FakeRealCodec extends Multimodal.MediaCodec {
  import Multimodal._
  def decodeBatch(in: MediaBatch): FeatureBatch =
    FeatureBatch(in.docIds, in.mimes, in.nBytes,
      Array.fill(in.size)(42), Array.fill(in.size)(24),
      Array.fill(in.size)(0L), Array.fill(in.size)(7L))
  def transcodeBatch(in: MediaBatch, maxBytes: Int): MediaBatch = in
  def sampleFramesBatch(in: MediaBatch, frameBytes: Int, everyMs: Long): FrameBatch =
    FrameBatch(in.docIds, in.mimes, Array.fill(in.size)(0),
      Array.fill(in.size)(0L), in.nBytes, Array.fill(in.size)(7L))
}
