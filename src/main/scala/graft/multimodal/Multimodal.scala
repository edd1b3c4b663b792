package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batched per partition behind a pluggable decoder.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is
  * real; the actual codec is STUBBED (`StubDecoder`) because no media
  * libraries ship in this environment — swap in a real decoder via
  * [[decodeFeatures]]'s `decoder` argument on a cluster. At 100 TB
  * the payload column stays columnar-compressed in parquet, decode is
  * narrow (no shuffle), and feature rows are far smaller than inputs,
  * so this pipeline is scan-bound.
  */
object Multimodal {

  /** One media record: payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      payload: Array[Byte])

  /** Extracted features (fixed-width, columnar-friendly). */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      feature_hash: Long)

  /** A batched decoder: one call per partition iterator so real
    * implementations can amortize codec/model setup.
    */
  trait Decoder extends Serializable {
    def decode(batch: Iterator[MediaRecord]): Iterator[MediaFeatures]
  }

  /** Deterministic fake decoder — real byte-level arithmetic over the
    * payload (so the plumbing is genuinely exercised) but no codec.
    */
  object StubDecoder extends Decoder {
    def decode(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      batch.map { r =>
        var h = -3750763034362895579L
        var i = 0
        while (i < r.payload.length) { h = h * 1099511628211L + r.payload(i); i += 1 }
        MediaFeatures(r.doc_id, r.mime, r.n_bytes,
          width = 64 + math.floorMod(h, 1856).toInt,
          height = 64 + math.floorMod(h >> 11, 1016).toInt,
          duration_ms = if (r.mime == "image/png") 0L else math.floorMod(h >> 23, 600000L),
          feature_hash = h)
      }
  }

  /** Build a media table from the documents table: the text payload
    * stands in for real bytes (deterministic), mime rotates by id.
    */
  def attachPayloads(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      length(col("text")).cast("long").as("n_bytes"),
      col("text").cast("binary").as("payload"))

  /** Run the batched decode over the media table. Narrow operation —
    * one decoder instance per partition, no shuffle.
    */
  def decodeFeatures(media: DataFrame, decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(batch => decoder.decode(batch))
  }

  // ------------------------------------------------------------------
  // resize (payload → payload transcoding)
  // ------------------------------------------------------------------

  /** A batched payload→payload transcoder (resize / re-encode /
    * downsample). Closed over [[MediaRecord]] so transcode stages
    * compose: resize → frame-sample → decode all chain as narrow
    * mapPartitions with no shuffle between them.
    */
  trait Transcoder extends Serializable {
    def transcode(batch: Iterator[MediaRecord]): Iterator[MediaRecord]
  }

  /** Deterministic stub "resize": keeps every k-th payload byte so the
    * output is ≤ maxBytes (a real implementation decodes, scales, and
    * re-encodes; the size-contraction contract and the batch shape are
    * what the pipeline depends on).
    */
  final class StubResizer(maxBytes: Int) extends Transcoder {
    def transcode(batch: Iterator[MediaRecord]): Iterator[MediaRecord] =
      batch.map { r =>
        if (r.payload.length <= maxBytes) r
        else {
          val stride = (r.payload.length + maxBytes - 1) / maxBytes
          val out = r.payload.indices.collect {
            case i if i % stride == 0 => r.payload(i)
          }.toArray
          MediaRecord(r.doc_id, r.mime, out.length.toLong, out)
        }
      }
  }

  /** Batched resize pass — same narrow shape as [[decodeFeatures]]. */
  def resizePayloads(media: DataFrame, maxBytes: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(new StubResizer(maxBytes).transcode(_))
  }

  // ------------------------------------------------------------------
  // frame sampling (1 video row → N frame rows)
  // ------------------------------------------------------------------

  /** One sampled frame of a video payload. */
  final case class FrameSample(
      doc_id: Long,
      mime: String,
      frame_idx: Int,
      ts_ms: Long,
      n_bytes: Long,
      frame_hash: Long)

  /** Deterministic stub frame sampler: video payloads yield one frame
    * row per `frameBytes` chunk (timestamped every `everyMs`);
    * non-video rows pass through as a single frame 0. The 1→N
    * expansion happens INSIDE the partition iterator — no shuffle, and
    * output rows (fixed-width features) are far smaller than payloads,
    * the shape that keeps a 100 TB video corpus scan-bound.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
                   everyMs: Long = 1000L): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap { r =>
      def hash(from: Int, until: Int): Long = {
        var h = -3750763034362895579L
        var i = from
        while (i < until && i < r.payload.length) { h = h * 1099511628211L + r.payload(i); i += 1 }
        h
      }
      if (r.mime != "video/mp4" || r.payload.isEmpty) {
        Iterator.single(FrameSample(r.doc_id, r.mime, 0, 0L,
          r.payload.length.toLong, hash(0, r.payload.length)))
      } else {
        val n = (r.payload.length + frameBytes - 1) / frameBytes
        (0 until n).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, r.payload.length)
          FrameSample(r.doc_id, r.mime, f, f * everyMs,
            (until - from).toLong, hash(from, until))
        }
      }
    })
  }
}
