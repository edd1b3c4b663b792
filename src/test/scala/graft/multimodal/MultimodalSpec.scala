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
