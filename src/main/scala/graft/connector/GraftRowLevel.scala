package graft.connector

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{InputPartition, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.SnapshotStore
import graft.store.SnapshotStore.Manifest

/** SQL row-level operations (`DELETE FROM` / `UPDATE` / `MERGE INTO`)
  * over a graft table — the group-based copy-on-write protocol, with
  * the BUCKET as the group (the reference's whole write surface is
  * MERGE procedures, `/root/reference/with procedures/order_proc.sql:
  * 34-88`; this makes the same statements first-class Spark SQL
  * against the graft catalog).
  *
  * How a statement executes at scale:
  *   1. Spark's rewrite reads the AFFECTED groups through
  *      [[GraftCoWScan]] — statically pruned by the condition's stats
  *      bounds (DELETE/UPDATE), then RUNTIME-narrowed to the buckets
  *      actually holding matched keys via the `_graft_bucket` metadata
  *      column (Spark's row-level runtime group filtering — the MERGE
  *      path's equivalent of dynamic partition pruning, so a MERGE
  *      touching 0.1% of keys rewrites ~0.1% of buckets, not the
  *      table);
  *   2. the replacement rows land in a STAGING spill (length-prefixed
  *      UnsafeRow frames — schema-agnostic, no re-encode) written by
  *      ordinary distributed tasks;
  *   3. commit publishes ONE atomic version via
  *      [[SnapshotStore.replaceBuckets]]: scanned buckets are replaced
  *      by their staged content (folding tombstones), rows hashing
  *      outside the scanned set (MERGE inserts, key-moving updates)
  *      upsert-merge into their buckets, and a commit that raced an
  *      overlapping writer refuses (ConcurrentModificationException)
  *      instead of silently dropping the winner's changes.
  *
  * The scan must return WHOLE groups, so — unlike the regular scan —
  * it disables file-level pruning and parquet row-group skipping:
  * dropping a non-matching row of an affected bucket there would
  * delete it from the rewritten table. Bucket-level pruning IS the
  * group selection and stays.
  */
class GraftRowLevelOperation(root: String, tableSchema: StructType,
                             cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** Set by the CoW scan when it plans (post runtime narrowing): the
    * GROUP set the write must replace, and the snapshot version the
    * replacement was computed against (the write's conflict check).
    * Driver-side handshake only — scan and write builders both hang
    * off this operation instance.
    */
  @volatile private[connector] var scannedBuckets: Set[Int] = Set.empty
  @volatile private[connector] var scanVersion: Option[Long] = None

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft row-level $cmd on $root"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    val m = GraftTable.manifestAt(spark, root, None)
    scanVersion = Some(m.version)
    new GraftCoWScanBuilder(spark, root, m, tableSchema, this)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraftStagedWrite(root, info.schema(), GraftRowLevelOperation.this)
    }

  /** The group identity rides every scanned row so Spark's runtime
    * group filtering can collect `distinct _graft_bucket` of the
    * matching rows and feed it back through [[GraftCoWScan.filter]].
    */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(SnapshotStore.BucketCol))
}

/** Scan builder for the rewrite's target-table read: pushed filters
  * are retained as residuals and used ONLY for bucket-level (group)
  * pruning — see the class note on [[GraftRowLevelOperation]] for why
  * finer pruning is forbidden here.
  */
class GraftCoWScanBuilder(spark: SparkSession, root: String, m: Manifest,
                          tableSchema: StructType, op: GraftRowLevelOperation)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val statsCols = m.statsCols.map(_._1).toSet
    pushed = filters.filter(f => f.references.nonEmpty &&
      f.references.forall(statsCols.contains))
    filters // all residual: the rewrite plan re-applies the condition
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftCoWScan(spark, root, m, tableSchema, required, pushed, op)
}

/** The copy-on-write variant of [[GraftScan]]: whole buckets only
  * (no file pruning, no parquet filters), runtime group filtering on
  * the bucket metadata column, and the final group set reported back
  * to the operation for the write's replace step.
  */
class GraftCoWScan(spark: SparkSession, root: String, m: Manifest,
                   dataSchema: StructType, required: StructType,
                   filters: Array[Filter], op: GraftRowLevelOperation)
    extends GraftScan(spark, root, m, dataSchema, required, filters) {

  override protected def fileLevelPruning: Boolean = false
  override protected def parquetFilters: Seq[Filter] = Nil

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(SnapshotStore.BucketCol))

  override def filter(predicates: Array[Predicate]): Unit = {
    org.apache.spark.sql.graft.GraftSqlShims.toV1Filters(predicates).foreach {
      case In(SnapshotStore.BucketCol, vs) =>
        narrowGroups(vs.toSeq.collect { case i: java.lang.Integer => i.intValue() }.toSet)
      case EqualTo(SnapshotStore.BucketCol, v: java.lang.Integer) =>
        narrowGroups(Set(v.intValue()))
      case _ => () // unknown shapes never narrow (conservative)
    }
  }

  private def narrowGroups(bs: Set[Int]): Unit = {
    runtimeBuckets = Some(runtimeBuckets.fold(bs)(_.intersect(bs)))
    invalidatePlanning()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = super.planInputPartitions()
    op.scannedBuckets = survivingBuckets
    parts
  }

  override def description(): String = s"graft-cow ${super.description()}"
}

/** The rewrite's write side: distributed staging of the replacement
  * rows, then one driver-side [[SnapshotStore.replaceBuckets]] commit.
  * Staged frames are raw UnsafeRow bytes — schema-agnostic (nested
  * types included), zero encode/decode beyond what the rows already
  * are — under `<root>/_staging/`, removed on commit and abort alike
  * (a crashed statement's leftovers sit outside `_commits` and the
  * bucket dirs, invisible to readers).
  */
class GraftStagedWrite(root: String, writeSchema: StructType,
                       op: GraftRowLevelOperation)
    extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  private val stagingRel =
    s"_staging/rlo-${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"

  /** Data columns to persist: the write schema minus the bucket
    * metadata column (layout metadata — recomputed from the keys at
    * commit, never stored).
    */
  private val dataSchema: StructType = StructType(
    writeSchema.fields.filterNot(_.name == SnapshotStore.BucketCol).toSeq)

  override def toBatch: BatchWrite = this
  override def description(): String =
    s"graft row-level ${op.command()} write on $root"

  /** Cluster the replacement rows by their TARGET bucket before they
    * reach the writers (the transform resolves through the catalog's
    * `bucket` function): one delta-sized shuffle in the rewrite plan
    * buys each rewritten bucket landing as ONE file instead of
    * per-task fragments — at scale the difference between a rewrite
    * that needs compaction immediately and one that doesn't. Keys
    * missing from the write schema (shouldn't happen — replacement
    * rows are full rows) degrade to unspecified distribution.
    */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution = {
    val spark = SparkSession.active
    val m = GraftTable.manifestAt(spark, root, None)
    val ok = m.keys.nonEmpty &&
      m.keys.forall(k => writeSchema.fieldNames.contains(k))
    if (!ok) org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    else org.apache.spark.sql.connector.distributions.Distributions.clustered(Array(
      Expressions.apply("bucket",
        (Expressions.literal(m.numBuckets) +: m.keys.map(k =>
          Expressions.column(k)
            : org.apache.spark.sql.connector.expressions.Expression)): _*)))
  }

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array.empty

  override def requiredNumPartitions(): Int = 0 // let the planner size it

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftStagedWriterFactory(new Path(root, stagingRel).toString,
      writeSchema, dataSchema,
      new GraftSerializableConf(
        SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    try {
      val files = messages.collect { case GraftStagedFile(p, n) if n > 0 => p }
      val staged = GraftStagedIO.stagedDf(spark, files.toSeq, dataSchema)
      val keys = GraftWrite.resolveKeys(spark, root, Nil, exists = true)
      // a group-based DELETE's replacement rows are exactly the
      // SURVIVING current rows of the scanned buckets — a subset, so
      // the commit can skip its dup/outside census job (rows keep
      // their buckets and key uniqueness carries over); UPDATE/MERGE
      // can rewrite keys and must keep the census
      SnapshotStore.replaceBuckets(spark, root, op.scannedBuckets, staged,
        keys, basedOnVersion = op.scanVersion,
        replacementIsSubset =
          op.command() == RowLevelOperation.Command.DELETE): Unit
    } finally cleanupStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging()

  private def cleanupStaging(): Unit = {
    val p = new Path(root, stagingRel)
    try {
      val fs = p.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration)
      fs.delete(p, true): Unit
    } catch { case _: IOException => () }
  }
}

/** One staged spill file: its path and row count (count 0 = the task
  * saw no rows and created no file).
  */
case class GraftStagedFile(path: String, rows: Long) extends WriterCommitMessage

class GraftStagedWriterFactory(stagingDir: String, writeSchema: StructType,
                               dataSchema: StructType,
                               conf: GraftSerializableConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftStagedWriter(stagingDir, partitionId, taskId,
      writeSchema, dataSchema, conf.value)
}

/** Task-side staging writer: projects each row to the data schema and
  * appends it as a length-prefixed UnsafeRow frame. One file per
  * committed task attempt (the commit coordinator admits exactly one
  * attempt per partition, and the file is named by task id, so a
  * speculative loser can neither collide nor leak into the commit).
  */
class GraftStagedWriter(stagingDir: String, partitionId: Int, taskId: Long,
                        writeSchema: StructType, dataSchema: StructType,
                        conf: Configuration)
    extends DataWriter[InternalRow] {

  private val spill = new GraftSpill(
    new Path(stagingDir, f"part-$partitionId%05d-$taskId"), conf)
  private val proj = UnsafeProjection.create(
    dataSchema.fields.toIndexedSeq.map { f =>
      val i = writeSchema.fieldIndex(f.name)
      BoundReference(i, f.dataType, f.nullable)
        : org.apache.spark.sql.catalyst.expressions.Expression
    })

  override def write(row: InternalRow): Unit = spill.add(proj(row))

  override def commit(): WriterCommitMessage = {
    val (p, n) = spill.finish()
    GraftStagedFile(p, n)
  }

  override def abort(): Unit = spill.dispose()
  override def close(): Unit = ()
}

private[connector] object GraftStagedIO {

  /** The staged spill files of one write, read back as ONE batch
    * DataFrame (empty frame when no task staged rows) — the shared
    * commit-side half of the spill protocol.
    */
  def stagedDf(spark: SparkSession, files: Seq[String],
               schema: StructType): org.apache.spark.sql.DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else {
      val conf = new GraftSerializableConf(
        spark.sparkContext.hadoopConfiguration)
      val n = schema.length
      val rdd = spark.sparkContext
        .parallelize(files.toIndexedSeq,
          math.max(1, math.min(files.size,
            spark.sparkContext.defaultParallelism)))
        .flatMap(p => GraftStagedIO.readRows(p, n, conf.value))
      org.apache.spark.sql.graft.GraftSqlShims.batchDataFrame(spark, rdd, schema)
    }

  /** Stream a staged spill back as InternalRows. Each frame gets its
    * own backing array (no row reuse — downstream operators may
    * buffer). The stream closes at exhaustion and, for partially
    * consumed iterators, with the task.
    */
  def readRows(path: String, nFields: Int, conf: Configuration)
      : Iterator[InternalRow] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = new java.io.DataInputStream(
      new net.jpountz.lz4.LZ4BlockInputStream(fs.open(p)))
    var closed = false
    def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => closeOnce()))
    new Iterator[InternalRow] {
      private var nextLen = in.readInt()
      override def hasNext: Boolean = {
        val more = nextLen >= 0
        if (!more) closeOnce()
        more
      }
      override def next(): InternalRow = {
        val bytes = new Array[Byte](nextLen)
        in.readFully(bytes)
        val r = new UnsafeRow(nFields)
        r.pointTo(bytes, nextLen)
        nextLen = in.readInt()
        r
      }
    }
  }
}

// ---------------------------------------------------------------------
// DELTA (merge-on-read-shaped) row-level operations
// ---------------------------------------------------------------------

/** The `SupportsDelta` variant of the row-level protocol: Spark's
  * rewrite emits only the CHANGED rows — `insert(row)` /
  * `update(meta, id, row)` / `delete(meta, id)` callbacks per row —
  * so the plan and staging carry O(changed rows), never whole groups.
  * The scan side is the ORDINARY pruned scan (exact filters, file
  * pruning, row-group skipping all allowed — row identity, not group
  * membership, drives the rewrite).
  *
  * Commit shape: a DELETE-only statement lands as a merge-on-read
  * TOMBSTONE commit ([[SnapshotStore.commitDeletes]] — zero bucket
  * rewrite, for ARBITRARY conditions including subqueries); anything
  * carrying inserts/updates lands through
  * [[SnapshotStore.applyRowDelta]] (touched buckets rewrite once as
  * `(current ∖ deleted) ⊎ upserts`).
  *
  * Selected by the TABLE property `dml.mode=delta` (recorded at
  * CREATE or via ALTER TABLE SET TBLPROPERTIES — it declares the
  * not-null-merge-key contract Spark's row-id rewrite requires,
  * enforced on every write; `spark.graft.dml.mode` only overrides
  * the choice per session). The copy-on-write path stays the default
  * because its runtime GROUP narrowing reads only affected buckets,
  * where the delta path's join reads the (runtime-filtered) target
  * once; which wins depends on how concentrated the touched keys are.
  */
class GraftDeltaOperation(root: String, tableSchema: StructType,
                          cmd: RowLevelOperation.Command, keys: Seq[String])
    extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  @volatile private[connector] var scanVersion: Option[Long] = None

  private[connector] def mergeKeys: Seq[String] = keys

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft row-delta $cmd on $root"

  override def rowId(): Array[NamedReference] =
    keys.map(Expressions.column).toArray

  override def representUpdateAsDeleteAndInsert(): Boolean = false

  /** The bucket id rides every scanned row (injected per partition —
    * layout metadata, not stored) so [[DeltaDmlRuntimeFiltering]] can
    * key its runtime source filter on it: the rewrite join's source
    * side computes `pmod(hash(keys), n)` and the scan narrows to those
    * buckets before reading files. The delta writers ignore the
    * metadata row.
    */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(SnapshotStore.BucketCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    val m = GraftTable.manifestAt(spark, root, None)
    scanVersion = Some(m.version)
    new GraftDeltaScanBuilder(spark, root, m, tableSchema, this)
  }

  override def newWriteBuilder(info: LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new GraftDeltaWrite(root, info.schema(),
          info.rowIdSchema().orElse(null), keys, GraftDeltaOperation.this)
    }
}

/** Scan builder for the DELTA rewrite's target read: the ordinary
  * pruned scan (exact filters, file pruning, row-group skipping all
  * allowed), marked so [[DeltaDmlRuntimeFiltering]] can recognize the
  * rewrite target inside the plan and key a runtime source-bucket
  * filter on its `_graft_bucket` metadata column.
  */
class GraftDeltaScanBuilder(spark: SparkSession, root: String, m: Manifest,
                            tableSchema: StructType,
                            op: GraftDeltaOperation)
    extends GraftScanBuilder(spark, root, m, tableSchema) {
  override def build(): Scan =
    new GraftDeltaScan(spark, root, m, tableSchema, required, pushed, op)
}

/** The delta rewrite's target scan — behaviorally the regular
  * [[GraftScan]]; exists as a distinct type so the optimizer rule can
  * find the rewrite TARGET (the source side of a self-merge reads
  * through the ordinary scan, so there is never ambiguity).
  */
class GraftDeltaScan(spark: SparkSession, root: String, m: Manifest,
                     dataSchema: StructType, required: StructType,
                     filters: Array[Filter],
                     private[connector] val op: GraftDeltaOperation)
    extends GraftScan(spark, root, m, dataSchema, required, filters) {
  private[connector] def mergeKeys: Seq[String] = op.mergeKeys
  private[connector] def bucketCount: Int = m.numBuckets
  override def description(): String = s"graft-delta ${super.description()}"
}

/** Delta write: each task stages its changed full rows and its
  * deleted/updated identities as two LZ4 UnsafeRow spills; the commit
  * turns them into a tombstone commit (deletes only) or one
  * [[SnapshotStore.applyRowDelta]] version.
  */
class GraftDeltaWrite(root: String, rowSchema: StructType,
                      idSchemaOrNull: StructType, keys: Seq[String],
                      op: GraftDeltaOperation)
    extends org.apache.spark.sql.connector.write.DeltaWrite
    with org.apache.spark.sql.connector.write.DeltaBatchWrite {

  private val idSchema: StructType =
    Option(idSchemaOrNull).getOrElse(StructType(
      keys.map(k => rowSchema(rowSchema.fieldIndex(k)))))

  private val stagingRel =
    s"_staging/rld-${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"

  override def toBatch: org.apache.spark.sql.connector.write.DeltaBatchWrite = this
  override def description(): String = s"graft row-delta ${op.command()} write on $root"

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory =
    new GraftDeltaWriterFactory(new Path(root, stagingRel).toString,
      rowSchema, idSchema,
      new GraftSerializableConf(
        SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    try {
      val msgs = messages.collect { case m: GraftDeltaFiles => m }
      val upserts = GraftStagedIO.stagedDf(spark,
        msgs.filter(_.upsertRows > 0).map(_.upsertPath).toSeq, rowSchema)
      val deletes = GraftStagedIO.stagedDf(spark,
        msgs.filter(_.deleteRows > 0).map(_.deletePath).toSeq, idSchema)
      val anyUpserts = msgs.exists(_.upsertRows > 0)
      val anyDeletes = msgs.exists(_.deleteRows > 0)
      if (!anyUpserts && anyDeletes)
        // pure DELETE: merge-on-read tombstones, no bucket rewrite.
        // The deleted ids were computed against the scan's snapshot —
        // thread it through so a winner that replaced one of those
        // rows in the meantime surfaces as a conflict, not a silently
        // tombstoned update.
        SnapshotStore.commitDeletes(spark, root,
          deletes.select(keys.map(org.apache.spark.sql.functions.col): _*),
          keys, basedOnVersion = op.scanVersion): Unit
      else if (anyUpserts || anyDeletes)
        SnapshotStore.applyRowDelta(spark, root, upserts,
          deletes.select(keys.map(org.apache.spark.sql.functions.col): _*), keys,
          basedOnVersion = op.scanVersion): Unit
    } finally cleanupStaging(spark)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging(SparkSession.active)

  private def cleanupStaging(spark: SparkSession): Unit = {
    val p = new Path(root, stagingRel)
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true): Unit
    } catch { case _: IOException => () }
  }
}

/** Both spills of one delta task: the changed full rows and the
  * deleted/updated identities.
  */
case class GraftDeltaFiles(upsertPath: String, upsertRows: Long,
                           deletePath: String, deleteRows: Long)
  extends WriterCommitMessage

class GraftDeltaWriterFactory(stagingDir: String, rowSchema: StructType,
                              idSchema: StructType,
                              conf: GraftSerializableConf)
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new GraftDeltaWriter(stagingDir, partitionId, taskId,
      rowSchema, idSchema, conf.value)
}

class GraftDeltaWriter(stagingDir: String, partitionId: Int, taskId: Long,
                       rowSchema: StructType, idSchema: StructType,
                       conf: Configuration)
    extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {

  private def spill(suffix: String) =
    new GraftSpill(new Path(stagingDir,
      f"part-$partitionId%05d-$taskId-$suffix"), conf)

  private val upserts = spill("u")
  private val deletes = spill("d")
  // rows arrive as the plan's own (possibly Unsafe) rows — copy to a
  // stable frame via identity projections
  private val rowProj = UnsafeProjection.create(rowSchema)
  private val idProj = UnsafeProjection.create(idSchema)

  override def insert(row: InternalRow): Unit = upserts.add(rowProj(row))

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    deletes.add(idProj(id))
    upserts.add(rowProj(row))
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    deletes.add(idProj(id))

  override def commit(): WriterCommitMessage = {
    val (up, un) = upserts.finish()
    val (dp, dn) = deletes.finish()
    GraftDeltaFiles(up, un, dp, dn)
  }

  override def abort(): Unit = { upserts.dispose(); deletes.dispose() }
  override def close(): Unit = ()
}

/** One lazily-opened LZ4 UnsafeRow spill file (length-prefixed
  * frames, -1 terminator — the format [[GraftStagedIO.readRows]]
  * streams back).
  */
private[connector] final class GraftSpill(path: Path, conf: Configuration) {
  private var out: java.io.DataOutputStream = null
  private var n = 0L
  def add(u: UnsafeRow): Unit = {
    if (out == null)
      out = new java.io.DataOutputStream(new net.jpountz.lz4.LZ4BlockOutputStream(
        path.getFileSystem(conf).create(path, true)))
    val bytes = u.getBytes
    out.writeInt(bytes.length)
    out.write(bytes)
    n += 1
  }
  def finish(): (String, Long) = {
    if (out != null) { out.writeInt(-1); out.close() }
    (if (n > 0) path.toString else "", n)
  }
  def dispose(): Unit = {
    try { if (out != null) out.close() } catch { case _: IOException => () }
    try { path.getFileSystem(conf).delete(path, false); () }
    catch { case _: IOException => () }
  }
}

/** A serializable Hadoop `Configuration` carrier (the executor-side
  * staging IO needs the driver's FS conf; Spark's own wrapper is
  * `private[spark]`).
  */
class GraftSerializableConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
