package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / transcode /
  * frame-sample run behind a COLUMNAR-BATCH codec contract — the
  * mapInArrow/mapInPandas call shape (aligned column vectors per
  * batch, bounded by a configured max batch size), not a per-row
  * callback — so a real codec amortizes its setup and its columnar IO
  * across a whole batch.
  *
  * The codec is REGISTERED VIA CONFIG (`graft.multimodal.codec` = a
  * class name instantiated on the executors), so swapping the stub for
  * a real cluster codec is a config change with ZERO plumbing change:
  * schemas, partitioning, batching, and every query over the features
  * stay as spec'd here. The default [[StubMediaCodec]] does real
  * byte-level arithmetic (the plumbing is genuinely exercised) but no
  * actual media decode — no media libraries ship in this environment.
  * At 100 TB the payload column stays columnar-compressed in parquet,
  * every codec pass is narrow (no shuffle), and feature rows are far
  * smaller than inputs, so the pipeline is scan-bound.
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

  /** One sampled frame of a video payload. */
  final case class FrameSample(
      doc_id: Long,
      mime: String,
      frame_idx: Int,
      ts_ms: Long,
      n_bytes: Long,
      frame_hash: Long)

  // ------------------------------------------------------------------
  // columnar batch contract
  // ------------------------------------------------------------------

  /** A batch of media rows as ALIGNED COLUMN VECTORS (index i across
    * every array is one row) — the Arrow record-batch shape, which is
    * what a real codec binds to (contiguous buffers in, contiguous
    * buffers out), not an `Iterator[Row]`.
    */
  final case class MediaBatch(docIds: Array[Long], mimes: Array[String],
                              nBytes: Array[Long], payloads: Array[Array[Byte]]) {
    def size: Int = docIds.length
  }

  /** Aligned feature vectors — same length as the input batch. */
  final case class FeatureBatch(docIds: Array[Long], mimes: Array[String],
                                nBytes: Array[Long], widths: Array[Int],
                                heights: Array[Int], durationsMs: Array[Long],
                                featureHashes: Array[Long]) {
    def size: Int = docIds.length
  }

  /** Aligned frame vectors — 1→N expansion, so usually LONGER than the
    * input batch (every array still mutually aligned).
    */
  final case class FrameBatch(docIds: Array[Long], mimes: Array[String],
                              frameIdxs: Array[Int], tsMs: Array[Long],
                              nBytes: Array[Long], frameHashes: Array[Long]) {
    def size: Int = docIds.length
  }

  /** The pluggable codec: one instance per partition (setup amortized),
    * one call per column batch. Implementations MUST be constructible
    * via a no-arg constructor — the class name travels through config,
    * not a closure, so the driver never needs the codec on its
    * classpath lifecycle (same deployment shape as a datasource).
    */
  trait MediaCodec extends Serializable {
    /** Decode metadata features for every row of the batch. */
    def decodeBatch(in: MediaBatch): FeatureBatch
    /** Payload→payload transcode (resize / re-encode / downsample),
      * contracting each payload to ≤ maxBytes.
      */
    def transcodeBatch(in: MediaBatch, maxBytes: Int): MediaBatch
    /** Sample frames from video payloads (1→N); non-video rows pass
      * through as their single frame 0.
      */
    def sampleFramesBatch(in: MediaBatch, frameBytes: Int, everyMs: Long): FrameBatch
  }

  /** Config key naming the [[MediaCodec]] implementation class. */
  val CodecConfKey = "graft.multimodal.codec"
  /** Config key bounding rows per codec batch (the
    * arrow-maxRecordsPerBatch analog; bounds executor memory held in
    * aligned vectors at any payload size).
    */
  val BatchSizeConfKey = "graft.multimodal.batchSize"

  private def confOr(df: DataFrame, key: String, dflt: String): String =
    df.sparkSession.conf.get(key, dflt)

  private def instantiate(className: String): MediaCodec =
    Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[MediaCodec]

  private def toBatches(media: DataFrame): (String, Int, Dataset[MediaRecord]) = {
    val spark = media.sparkSession
    import spark.implicits._
    val codecClass = confOr(media, CodecConfKey, classOf[StubMediaCodec].getName)
    val batchSize = confOr(media, BatchSizeConfKey, "1024").toInt
    require(batchSize >= 1, s"$BatchSizeConfKey must be ≥ 1")
    (codecClass, batchSize, media.as[MediaRecord])
  }

  private def mkBatch(rows: Seq[MediaRecord]): MediaBatch = MediaBatch(
    rows.map(_.doc_id).toArray, rows.map(_.mime).toArray,
    rows.map(_.n_bytes).toArray, rows.map(_.payload).toArray)

  // ------------------------------------------------------------------
  // the three narrow codec passes (schema-stable public surface)
  // ------------------------------------------------------------------

  /** Batched feature decode over the media table. Narrow — one codec
    * instance per partition, one call per column batch, no shuffle.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val (codecClass, batchSize, ds) = toBatches(media)
    ds.mapPartitions { it =>
      val codec = instantiate(codecClass)
      it.grouped(batchSize).flatMap { rows =>
        val out = codec.decodeBatch(mkBatch(rows))
        require(out.size == rows.size,
          s"codec $codecClass returned ${out.size} features for ${rows.size} rows")
        (0 until out.size).iterator.map(i => MediaFeatures(out.docIds(i),
          out.mimes(i), out.nBytes(i), out.widths(i), out.heights(i),
          out.durationsMs(i), out.featureHashes(i)))
      }
    }
  }

  /** Batched payload→payload resize — same narrow shape as
    * [[decodeFeatures]]; stages compose (resize → frame-sample →
    * decode chain with no shuffle between them).
    */
  def resizePayloads(media: DataFrame, maxBytes: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    val (codecClass, batchSize, ds) = toBatches(media)
    ds.mapPartitions { it =>
      val codec = instantiate(codecClass)
      it.grouped(batchSize).flatMap { rows =>
        val out = codec.transcodeBatch(mkBatch(rows), maxBytes)
        // same 1:1 contract check as decodeFeatures — a codec that
        // filters or reorders rows must fail loudly, not mispair
        // payloads with doc ids downstream
        require(out.size == rows.size,
          s"codec $codecClass returned ${out.size} payloads for ${rows.size} rows")
        (0 until out.size).iterator.map(i => MediaRecord(out.docIds(i),
          out.mimes(i), out.nBytes(i), out.payloads(i)))
      }
    }
  }

  /** Batched frame sampling (1 video row → N frame rows). The
    * expansion happens INSIDE the codec batch — no shuffle, and output
    * rows (fixed-width features) are far smaller than payloads, the
    * shape that keeps a 100 TB video corpus scan-bound.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
                   everyMs: Long = 1000L): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    val (codecClass, batchSize, ds) = toBatches(media)
    ds.mapPartitions { it =>
      val codec = instantiate(codecClass)
      it.grouped(batchSize).flatMap { rows =>
        val out = codec.sampleFramesBatch(mkBatch(rows), frameBytes, everyMs)
        // 1→N contract: output size is free, but every frame must
        // belong to a row of THIS batch (no invented/mispaired ids)
        val inIds = rows.iterator.map(_.doc_id).toSet
        (0 until out.size).iterator.map { i =>
          require(inIds.contains(out.docIds(i)),
            s"codec $codecClass emitted a frame for doc ${out.docIds(i)} " +
              "not present in its input batch")
          FrameSample(out.docIds(i),
            out.mimes(i), out.frameIdxs(i), out.tsMs(i), out.nBytes(i),
            out.frameHashes(i))
        }
      }
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
}

/** Deterministic fake codec — real byte-level arithmetic over the
  * payload buffers (so every array stays genuinely aligned and the
  * batch plumbing is exercised end to end) but no actual media
  * libraries, which this environment doesn't ship. A real codec
  * implements the same three batch calls and is dropped in via
  * `graft.multimodal.codec` — zero plumbing change.
  */
final class StubMediaCodec extends Multimodal.MediaCodec {
  import Multimodal._

  private def fnv(payload: Array[Byte], from: Int, until: Int): Long = {
    var h = -3750763034362895579L
    var i = from
    while (i < until && i < payload.length) { h = h * 1099511628211L + payload(i); i += 1 }
    h
  }

  def decodeBatch(in: MediaBatch): FeatureBatch = {
    val n = in.size
    val widths = new Array[Int](n); val heights = new Array[Int](n)
    val durs = new Array[Long](n); val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = fnv(in.payloads(i), 0, in.payloads(i).length)
      widths(i) = 64 + math.floorMod(h, 1856).toInt
      heights(i) = 64 + math.floorMod(h >> 11, 1016).toInt
      durs(i) = if (in.mimes(i) == "image/png") 0L else math.floorMod(h >> 23, 600000L)
      hashes(i) = h
      i += 1
    }
    FeatureBatch(in.docIds, in.mimes, in.nBytes, widths, heights, durs, hashes)
  }

  def transcodeBatch(in: MediaBatch, maxBytes: Int): MediaBatch = {
    val outPayloads = in.payloads.map { p =>
      if (p.length <= maxBytes) p
      else {
        val stride = (p.length + maxBytes - 1) / maxBytes
        p.indices.collect { case i if i % stride == 0 => p(i) }.toArray
      }
    }
    MediaBatch(in.docIds, in.mimes, outPayloads.map(_.length.toLong), outPayloads)
  }

  def sampleFramesBatch(in: MediaBatch, frameBytes: Int, everyMs: Long): FrameBatch = {
    val docIds = Array.newBuilder[Long]; val mimes = Array.newBuilder[String]
    val idxs = Array.newBuilder[Int]; val ts = Array.newBuilder[Long]
    val nb = Array.newBuilder[Long]; val hashes = Array.newBuilder[Long]
    var r = 0
    while (r < in.size) {
      val p = in.payloads(r)
      if (in.mimes(r) != "video/mp4" || p.isEmpty) {
        docIds += in.docIds(r); mimes += in.mimes(r); idxs += 0; ts += 0L
        nb += p.length.toLong; hashes += fnv(p, 0, p.length)
      } else {
        val n = (p.length + frameBytes - 1) / frameBytes
        var f = 0
        while (f < n) {
          val from = f * frameBytes
          val until = math.min(from + frameBytes, p.length)
          docIds += in.docIds(r); mimes += in.mimes(r); idxs += f; ts += f * everyMs
          nb += (until - from).toLong; hashes += fnv(p, from, until)
          f += 1
        }
      }
      r += 1
    }
    FrameBatch(docIds.result(), mimes.result(), idxs.result(), ts.result(),
      nb.result(), hashes.result())
  }
}
