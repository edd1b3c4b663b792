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
}
