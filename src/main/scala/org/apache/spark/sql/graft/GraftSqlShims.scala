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
}

/** `SupportsStreamingUpdateAsAppend` is `private[sql]` — this public
  * re-export lets the connector's write builder declare that a
  * streaming UPDATE output mode may run through its append path (graft
  * appends ARE keyed upserts, which is exactly update semantics).
  */
trait GraftStreamingUpdatableBuilder
  extends org.apache.spark.sql.connector.write.WriteBuilder
  with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend
