package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` doorway a V1 streaming Source needs: the
  * DataFrame a `Source.getBatch` returns must carry
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * constructor that sets the flag is `SparkSession
  * .internalCreateDataFrame` — the same call Spark's own file and
  * socket sources make. This object lives under `org.apache.spark.sql`
  * purely to reach it; no other internals are touched.
  */
object GraftSqlShims {
  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                         schema: StructType): DataFrame =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Rebind a V1 `Sink.addBatch` micro-batch onto a plain batch plan:
    * the frame a sink receives is tied to the stream's incremental
    * execution and cannot safely back the multiple jobs a transactional
    * commit runs — its `toRdd` over a fresh batch frame can (the same
    * detach Spark's own V1 sinks perform).
    */
  def batchDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                     schema: StructType): DataFrame =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** V2 `Predicate` → V1 `Filter` translation (Spark's own, so the
    * supported shapes and literal conversions match what every file
    * source accepts). Used by the connector's runtime filtering and
    * SQL DELETE paths; untranslatable predicates drop out (callers
    * treat the result as a conservative subset).
    */
  def toV1Filters(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(predicates)

  /** One parquet FOOTER's Spark schema, converted with the SAME
    * session-conf-driven converter Spark's own schema inference uses
    * (binary-as-string, int96-as-timestamp, timestamp_ntz inference,
    * nanos-as-long, field ids) — so a driver-side footer read is a
    * drop-in replacement for the distributed `mergeSchema` inference
    * job on directories whose files share one schema (guide §1/§6:
    * every graft bucket dir is written by ONE job under ONE schema, so
    * one footer per dir IS the dir's schema).
    */
  def parquetFooterSchema(spark: SparkSession,
                          hconf: org.apache.hadoop.conf.Configuration,
                          file: org.apache.hadoop.fs.Path): StructType = {
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      hconf, file,
      org.apache.parquet.format.converter.ParquetMetadataConverter.SKIP_ROW_GROUPS)
    // prefer the footer's SERIALIZED Spark schema (the key Spark itself
    // writes and its inference's readSchemaFromFooter prefers) — exact
    // round-trip of types that don't survive the MessageType conversion
    // (r18 ADVICE: e.g. TIMESTAMP_NTZ under a different inferTimestampNTZ
    // conf); fall through to the conf-driven converter otherwise
    val serialized = Option(footer.getFileMetaData.getKeyValueMetaData
        .get("org.apache.spark.sql.parquet.row.metadata"))
      .flatMap { json =>
        try Some(org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[StructType])
        catch { case scala.util.control.NonFatal(_) => None }
      }
    serialized.getOrElse(
      new org.apache.spark.sql.execution.datasources.parquet
        .ParquetToSparkSchemaConverter(spark.sessionState.conf)
        .convert(footer.getFileMetaData.getSchema))
  }

  /** `StructType.merge` (private[sql]) — the exact merge Spark's
    * mergeSchema inference applies, so driver-side per-dir footer
    * schemas combine identically to the distributed job's result.
    */
  def mergeStructs(a: StructType, b: StructType): StructType = a.merge(b)

  /** `StructType.asNullable` (private[sql]): file-source relations
    * present nullable fields regardless of footer repetition — applied
    * so the footer-derived schema matches inference exactly.
    */
  def asNullable(s: StructType): StructType = s.asNullable
}

/** `SupportsStreamingUpdateAsAppend` is `private[sql]` — this public
  * re-export lets the connector's write builder declare that a
  * streaming UPDATE output mode may run through its append path (graft
  * appends ARE keyed upserts, which is exactly update semantics).
  */
trait GraftStreamingUpdatableBuilder
  extends org.apache.spark.sql.connector.write.WriteBuilder
  with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend
