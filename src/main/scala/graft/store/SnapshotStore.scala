package graft.store

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Scd1, Scd2}

/** A minimal transactional table format: versioned snapshots with
  * bucket-level copy-on-write and an atomic manifest commit — the
  * Delta/Iceberg-shaped layer the plain parquet sinks lack
  * (reference analog: Snowflake tables are transactional under the
  * MERGE procedures, e.g. `/root/reference/02 Location Entity.sql:282`;
  * plain parquet directories are not).
  *
  * Layout:
  * {{{
  *   <root>/_commits/<%020d>          one manifest per committed version
  *   <root>/v=<n>/_graft_bucket=<b>/  parquet files for buckets written AT version n
  * }}}
  *
  * A manifest lists, for every bucket, the version directory holding
  * its CURRENT files — so a commit writes only the buckets its delta
  * touches and re-points the rest at their existing files
  * (copy-on-write at bucket granularity, O(delta) data written per
  * commit at any table size). The manifest itself is published by an
  * atomic rename: readers either see the previous complete snapshot or
  * the new complete snapshot, never a torn mix — which plain
  * dynamic-partition-overwrite cannot guarantee across buckets.
  *
  * Concurrency: optimistic. A writer that loses the rename race
  * re-reads the new latest snapshot and re-merges (bounded retries).
  * Crash safety: a writer that dies after writing data but before the
  * manifest rename leaves an unreferenced `v=<n>` directory that
  * readers never see and [[vacuum]] removes.
  *
  * Rename atomicity holds on HDFS and local filesystems; object
  * stores need a conditional-put log store instead (the same caveat
  * and the same abstraction seam as Delta's LogStore).
  */
object SnapshotStore {

  /** Same stable hash-bucket column the streaming sinks use. */
  val BucketCol = "_graft_bucket"

  final case class Manifest(version: Long, numBuckets: Int, buckets: Map[Int, String])

  private def fileSystem(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(root: String) = new Path(root, "_commits")
  private def manifestPath(root: String, v: Long) =
    new Path(commitsDir(root), f"$v%020d")
  private def versionDir(root: String, v: Long) = new Path(root, s"v=$v")

  private def withBucket(df: DataFrame, keys: Seq[String], numBuckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(hash(keys.map(col): _*), lit(numBuckets)))

  // ------------------------------------------------------------------
  // manifest IO
  // ------------------------------------------------------------------

  /** Committed versions, ascending (empty if the table doesn't exist). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fileSystem(spark, root)
    val dir = commitsDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toLong).sorted
  }

  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  def readManifest(spark: SparkSession, root: String, v: Long): Manifest = {
    val fs = fileSystem(spark, root)
    val in = new BufferedReader(new InputStreamReader(
      fs.open(manifestPath(root, v)), StandardCharsets.UTF_8))
    try {
      val header = in.readLine() // "buckets:<n>"
      val numBuckets = header.stripPrefix("buckets:").trim.toInt
      val entries = Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty)
        .map { line =>
          val Array(b, dir) = line.split("\t", 2)
          b.toInt -> dir
        }.toMap
      Manifest(v, numBuckets, entries)
    } finally in.close()
  }

  /** Atomically publish version `v`: write to a temp name, then rename.
    * Returns false when another writer already committed `v`.
    */
  private def writeManifestAtomic(fs: FileSystem, root: String, v: Long,
                                  numBuckets: Int, buckets: Map[Int, String]): Boolean = {
    val target = manifestPath(root, v)
    if (fs.exists(target)) return false
    val tmp = new Path(commitsDir(root), s".tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try {
      val body = (s"buckets:$numBuckets" +:
        buckets.toSeq.sortBy(_._1).map { case (b, dir) => s"$b\t$dir" })
        .mkString("", "\n", "\n")
      out.write(body.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    val ok = !fs.exists(target) && fs.rename(tmp, target)
    if (!ok) fs.delete(tmp, false)
    ok
  }

  // ------------------------------------------------------------------
  // reads
  // ------------------------------------------------------------------

  /** The snapshot at version `v` (time travel; bucket column is layout
    * metadata, not data — it is not part of the returned schema).
    */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val m = readManifest(spark, root, v)
    readBuckets(spark, root, m, m.buckets.keySet)
  }

  /** The latest committed snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, latestVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no committed version at $root")))

  /** Bucket-pruned point lookup: read ONLY the bucket directories the
    * requested key tuples hash into — at any table size a key lookup
    * touches 1/numBuckets of the data (the layout's partition-pruning
    * dividend; [[commitDelta]] uses the same path for its merges).
    * `keyValues` are tuples in `keys` order.
    */
  def readForKeys(spark: SparkSession, root: String, keys: Seq[String],
                  keyValues: Seq[Seq[Any]]): DataFrame = {
    val m = readManifest(spark, root, latestVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no committed version at $root")))
    val schema = read(spark, root).schema
    val probe = spark.createDataFrame(
      spark.sparkContext.parallelize(keyValues.map(Row.fromSeq), 1),
      org.apache.spark.sql.types.StructType(keys.map(k => schema(k))))
    val buckets = withBucket(probe, keys, m.numBuckets)
      .select(BucketCol).distinct().collect().map(_.getInt(0)).toSet
    readBuckets(spark, root, m, buckets)
      .join(broadcast(probe), keys, "left_semi")
  }

  private def readBuckets(spark: SparkSession, root: String, m: Manifest,
                          which: Set[Int]): DataFrame = {
    val dirs = m.buckets.collect { case (b, dir) if which(b) => new Path(root, dir).toString }
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs.toSeq: _*)
  }

  // ------------------------------------------------------------------
  // writes
  // ------------------------------------------------------------------

  /** Create the table: full write of `df` as version 0. */
  def init(spark: SparkSession, root: String, df: DataFrame,
           keys: Seq[String], numBuckets: Int = 16): Long = {
    val fs = fileSystem(spark, root)
    require(latestVersion(spark, root).isEmpty, s"table already exists at $root")
    val written = writeVersionData(df, root, 0L, keys, numBuckets, fs)
    require(writeManifestAtomic(fs, root, 0L, numBuckets, written),
      s"concurrent init at $root")
    0L
  }

  /** Write `df`'s rows under v=<n>/ partitioned by bucket; returns the
    * bucket → directory map for the buckets that actually got files.
    */
  private def writeVersionData(df: DataFrame, root: String, v: Long,
                               keys: Seq[String], numBuckets: Int,
                               fs: FileSystem): Map[Int, String] = {
    val vdir = versionDir(root, v)
    withBucket(df, keys, numBuckets)
      .write.mode("overwrite").partitionBy(BucketCol).parquet(vdir.toString)
    if (!fs.exists(vdir)) Map.empty
    else fs.listStatus(vdir).toSeq
      .map(_.getPath.getName).filter(_.startsWith(s"$BucketCol="))
      .map(name => name.stripPrefix(s"$BucketCol=").toInt -> s"v=$v/$name")
      .toMap
  }

  /** Merge a delta in and commit a new version. `merge(current, delta)`
    * receives the CURRENT rows of only the buckets the delta touches
    * and must return the full replacement state for those buckets
    * (e.g. [[graft.operators.Scd1.merge]] /
    * [[graft.operators.Scd2.applyDelta]]). Untouched buckets are
    * re-pointed, not rewritten — O(delta) data written per commit.
    * On a lost commit race the merge re-runs against the new snapshot.
    */
  def commitDelta(spark: SparkSession, root: String, delta: DataFrame,
                  keys: Seq[String],
                  merge: (DataFrame, DataFrame) => DataFrame,
                  maxAttempts: Int = 5): Long = {
    val fs = fileSystem(spark, root)
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val base = latestVersion(spark, root)
        .getOrElse(throw new IllegalStateException(s"no table at $root — call init first"))
      val m = readManifest(spark, root, base)
      val v = base + 1

      val bucketed = withBucket(delta, keys, m.numBuckets)
      val touched = bucketed.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSet // ≤ numBuckets ids — metadata-sized
      val current = readBuckets(spark, root, m, touched)
      val currentAligned =
        if (current.schema.isEmpty) delta.limit(0) else current
      val merged = merge(currentAligned, delta)

      val written = writeVersionData(merged, root, v, keys, m.numBuckets, fs)
      // touched buckets now live at v; emptied buckets drop out; the
      // rest keep pointing at their existing files
      val next = (m.buckets -- touched) ++ written
      if (writeManifestAtomic(fs, root, v, m.numBuckets, next)) return v
      // lost the race: discard our data dir and re-merge on the new base
      fs.delete(versionDir(root, v), true)
    }
    throw new IllegalStateException(
      s"commitDelta lost $maxAttempts consecutive commit races at $root")
  }

  /** Drop all but the newest `keepLast` manifests, then delete every
    * data directory no kept manifest references — old version data and
    * orphans from crashed writers alike. Returns #paths deleted.
    * Time travel reaches only kept versions afterwards.
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 1): Int = {
    require(keepLast >= 1, "must keep at least the latest version")
    val fs = fileSystem(spark, root)
    val vs = versions(spark, root)
    if (vs.isEmpty) return 0
    val keep = vs.takeRight(keepLast)
    val latest = vs.last
    val referenced: Set[String] =
      keep.flatMap(v => readManifest(spark, root, v).buckets.values).toSet
    val deleted = mutable.ArrayBuffer.empty[Path]

    vs.dropRight(keepLast).foreach { v => deleted += manifestPath(root, v) }
    fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .foreach { st =>
        val vNum = st.getPath.getName.stripPrefix("v=").toLong
        val bucketDirs = fs.listStatus(st.getPath).toSeq
          .filter(_.getPath.getName.startsWith(s"$BucketCol="))
        val dead = bucketDirs.filterNot(b =>
          referenced(s"v=$vNum/${b.getPath.getName}"))
        // an in-flight writer's dir (version above latest) is not ours to touch
        if (vNum <= latest) {
          if (dead.size == bucketDirs.size) deleted += st.getPath
          else dead.foreach(b => deleted += b.getPath)
        }
      }
    deleted.foreach(p => fs.delete(p, true))
    deleted.size
  }

  // ------------------------------------------------------------------
  // streaming integration
  // ------------------------------------------------------------------

  /** Continuous SCD1 upsert with snapshot isolation: each micro-batch
    * commits one atomic version (vs [[graft.streaming.StreamPipeline
    * .scd1UpsertSink]], same incremental cost but readers can observe
    * a torn multi-bucket overwrite there; here they cannot).
    */
  def scd1SnapshotSink(stream: DataFrame, root: String, checkpointDir: String,
                       keys: Seq[String], orderBy: Seq[Column],
                       numBuckets: Int = 16): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty) {
          val b = batch.toDF()
          if (latestVersion(spark, root).isEmpty) {
            init(spark, root, Scd1.latestByKey(b, keys, orderBy), keys, numBuckets)
          } else {
            commitDelta(spark, root, b, keys,
              (cur, delta) => Scd1.merge(cur, delta, keys, orderBy))
          }
        }: Unit
      }
      .start()

  /** Streaming materialized view: maintain a grouped aggregate
    * incrementally under snapshot isolation. Each micro-batch is
    * pre-aggregated to partials, then merged with the CURRENT partials
    * of only the touched group-key buckets by re-aggregating — valid
    * for algebraic aggregates (sum/count/min/max), the same
    * partial-merge law q30 proves against a full recompute. Per batch:
    * O(delta + touched buckets), one atomic version.
    *
    * `aggs` must map partial columns to themselves (e.g. sum("n") as
    * "n") so merge(partials, partials) == partials of the union.
    */
  def aggSnapshotSink(stream: DataFrame, root: String, checkpointDir: String,
                      groupCols: Seq[String], aggs: Seq[Column],
                      numBuckets: Int = 16): StreamingQuery = {
    def reAgg(df: DataFrame): DataFrame =
      df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty) {
          val partials = reAgg(batch.toDF())
          if (latestVersion(spark, root).isEmpty) {
            init(spark, root, partials, groupCols, numBuckets)
          } else {
            commitDelta(spark, root, partials, groupCols,
              (cur, delta) => reAgg(cur.unionByName(delta)))
          }
        }: Unit
      }
      .start()
  }

  /** Continuous SCD2 dim maintenance with snapshot isolation: the
    * incremental [[Scd2.applyDelta]] fold (delta-keys-only
    * re-derivation, redelivery-idempotent) committing one atomic
    * version per micro-batch.
    */
  def scd2SnapshotSink(stream: DataFrame, root: String, checkpointDir: String,
                       keys: Seq[String], ts: String, tiebreak: String,
                       numBuckets: Int = 16): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty) {
          val b = batch.toDF()
          if (latestVersion(spark, root).isEmpty) {
            init(spark, root, Scd2.buildHistory(b, keys, ts, tiebreak), keys, numBuckets)
          } else {
            commitDelta(spark, root, b, keys,
              (cur, delta) => Scd2.applyDelta(cur, delta, keys, ts, tiebreak))
          }
        }: Unit
      }
      .start()
}
