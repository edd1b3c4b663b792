package graft.store

import java.io.{IOException, OutputStream}
import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

import graft.SparkSpec

/** Failure-mode classification at the commit layer (r14 ADVICE):
  *
  *  1. A manifest WRITE failure (disk full, quota) must surface its
  *     root cause and clear its own torn leftover — not report a clean
  *     loss that buries the IOException while the leftover blocks the
  *     version for the whole reclaim grace.
  *  2. A POSIX checkpoint publish whose delete/rename interleaves with
  *     a rival same-version publisher must not leave its tmp dir
  *     NESTED inside the rival's completed dir (Hadoop rename onto an
  *     existing directory moves INTO it and still returns true).
  */
class CommitFailureModesSpec extends SparkSpec {
  import spark.implicits._

  locally {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.ffs.impl", classOf[FailingPutFS].getName)
  }

  private val merge = (cur: org.apache.spark.sql.DataFrame,
                       delta: org.apache.spark.sql.DataFrame) =>
    SnapshotStore.upsertMerge(Seq("k"))(cur, delta)

  test("a manifest write failure surfaces its root cause and does not block the version") {
    try {
      val root = "ffs://" + Files.createTempDirectory("graft-ffs").toString
      SnapshotStore.init(spark, root,
        (1L to 8L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"),
        Seq("k"), numBuckets = 2)
      // v1's manifest tears after 4 bytes — a simulated device-full,
      // NOT a lost race (no rival anywhere)
      FailingPutFS.failPut = p =>
        p.getName == f"${1L}%020d" && p.getParent.getName == "_commits"
      val e = intercept[IllegalStateException] {
        SnapshotStore.commitDelta(spark, root,
          Seq((1L, "x", 100L)).toDF("k", "v", "ts"), Seq("k"), merge)
      }
      assert(e.getMessage.contains("failed writing the manifest") &&
        e.getMessage.contains("not a lost race"),
        s"wrong classification: ${e.getMessage}")
      assert(e.getCause.isInstanceOf[IOException] &&
        e.getCause.getMessage.contains("simulated device full"),
        s"root cause lost: ${e.getCause}")
      // the torn leftover was cleared: a retry lands IMMEDIATELY at the
      // same version (before the fix it burned OCC laps against the
      // leftover until the reclaim grace passed)
      FailingPutFS.reset()
      val v = SnapshotStore.commitDelta(spark, root,
        Seq((1L, "x", 100L)).toDF("k", "v", "ts"), Seq("k"), merge)
      assert(v == 1L, s"retry must land at the unblocked version, got $v")
      assert(SnapshotStore.read(spark, root).where("k = 1 AND v = 'x'").count() == 1L)
    } finally FailingPutFS.reset()
  }

  test("a lost conditional PUT still classifies as a clean loss (close-time IOException, rival terminator present)") {
    // the discriminator's other arm: on a conditional-PUT store the
    // close() IOException IS the loss signal — target holds the
    // rival's terminator, and the caller retries through OCC normally
    spark.sparkContext.hadoopConfiguration.set(
      "fs.osim.impl", classOf[ObjectStoreSim].getName)
    try {
      val root = "osim://" + Files.createTempDirectory("graft-ffs-cond").toString
      SnapshotStore.init(spark, root,
        Seq((1L, "a", 1L)).toDF("k", "v", "ts"), Seq("k"), numBuckets = 2)
      // two committers race v1; the close-time condition arbitrates —
      // BOTH must return (one wins v1, the loser retries to v2), no
      // write-failure escalation
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val gate = new java.util.concurrent.CountDownLatch(1)
      val futs = (0 until 2).map { i =>
        Future {
          gate.await()
          SnapshotStore.commitDelta(spark, root,
            Seq((10L + i, s"w$i", i.toLong)).toDF("k", "v", "ts"),
            Seq("k"), merge, maxAttempts = 16)
        }
      }
      gate.countDown()
      val vs = Await.result(Future.sequence(futs), 120.seconds)
      assert(vs.toSet == Set(1L, 2L), s"clean-loss retry broke: $vs")
    } finally ObjectStoreSim.reset()
  }

  test("POSIX checkpoint publish: a delete/rename interleave never nests the loser inside the rival's dir") {
    val root = Files.createTempDirectory("graft-cpnest").toString
    SnapshotStore.init(spark, root,
      (1L to 20L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = 2, statsCols = Seq("ts"))
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "x", 100L)).toDF("k", "v", "ts"), Seq("k"), merge)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = new Path(root, "_commits")
    val dest = new Path(commits, f"cp-${1L}%020d")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    // in the window between OUR clear-torn-dest delete and OUR rename,
    // a rival same-version publisher completes: dest re-exists, whole
    // and correct. (The rival's content is byte-equivalent by contract
    // — a checkpoint is a pure function of the manifest — so cloning
    // our own staged tmp IS the rival's publish.)
    SnapshotStore.checkpointRenameHook = d =>
      if (d == dest && fired.compareAndSet(false, true)) {
        val tmp = fs.listStatus(commits)
          .map(_.getPath).find(_.getName.startsWith(dest.getName + ".tmp-"))
          .getOrElse(fail("no staged tmp dir found"))
        FileUtil.copy(fs, tmp, fs, dest, false, true,
          spark.sparkContext.hadoopConfiguration): Unit
      }
    try SnapshotStore.checkpoint(spark, root)
    finally SnapshotStore.checkpointRenameHook = _ => ()
    assert(fired.get(), "the interleave window never fired")
    // the nest is detected and the stray removed: a clean, flat,
    // readable checkpoint dir and no tmp leftovers anywhere
    assert(fs.exists(new Path(dest, "_SUCCESS")))
    assert(fs.listStatus(dest).forall(_.isFile),
      s"stray subdir nested in checkpoint dir: " +
        fs.listStatus(dest).filter(_.isDirectory).map(_.getPath.getName).toSeq)
    assert(!fs.listStatus(commits).exists(_.getPath.getName.contains(".tmp-")),
      "staged tmp dir leaked into _commits")
    val kinds = spark.read.parquet(dest.toString)
      .select("kind").distinct().as[String].collect().toSet
    assert(Set("meta", "bucket").subsetOf(kinds),
      s"checkpoint content unreadable after the interleave: $kinds")
  }

  test("InMemoryClaimArbiter defaults couple to the store's loaded reclaim grace") {
    // default staleness (the store's 10-minute grace) must refuse a
    // supersede of a fresh row and keep same-token re-claims idempotent
    val arb = new InMemoryClaimArbiter()
    assert(arb.claim("osim:///t/_commits/00000000000000000001", "a"))
    assert(arb.claim("osim:///t/_commits/00000000000000000001", "a"),
      "same-token re-claim must stay a win")
    assert(!arb.claim("osim:///t/_commits/00000000000000000001", "b"),
      "a fresh row must not be supersedable inside the grace")
    assert(arb.owner("osim:///t/_commits/00000000000000000001").contains("a"))
  }
}

/** Local-FS double whose writes TEAR on demand: lets through
  * [[FailingPutFS.tearAfterBytes]] bytes for paths matching
  * [[FailingPutFS.failPut]], then every further write throws — the
  * device-full / quota shape, leaving a genuinely torn file on disk
  * (unlike [[ObjectStoreSim]]'s crashed PUT, which leaves nothing).
  */
object FailingPutFS {
  @volatile var failPut: Path => Boolean = _ => false
  @volatile var tearAfterBytes: Int = 4
  def reset(): Unit = { failPut = _ => false; tearAfterBytes = 4 }
}

class FailingPutFS extends RawLocalFileSystem {
  override def getUri: URI = URI.create("ffs:///")
  override def getScheme: String = "ffs"

  private def wrap(f: Path, out: FSDataOutputStream): FSDataOutputStream =
    if (!FailingPutFS.failPut(f)) out
    else new FSDataOutputStream(
      new TearingStream(out, FailingPutFS.tearAfterBytes), null)

  // every create overload must re-route (RawLocalFileSystem
  // short-circuits some past the 7-arg permission variant)
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    wrap(f, super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress))

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    wrap(f, super.create(f, overwrite, bufferSize, replication, blockSize,
      progress))

  override def createNonRecursive(f: Path, permission: FsPermission,
                                  overwrite: Boolean, bufferSize: Int,
                                  replication: Short, blockSize: Long,
                                  progress: Progressable): FSDataOutputStream =
    wrap(f, super.createNonRecursive(f, permission, overwrite, bufferSize,
      replication, blockSize, progress))

  override def createNonRecursive(f: Path, permission: FsPermission,
                                  flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
                                  bufferSize: Int, replication: Short,
                                  blockSize: Long,
                                  progress: Progressable): FSDataOutputStream =
    wrap(f, super.createNonRecursive(f, permission, flags, bufferSize,
      replication, blockSize, progress))
}

private[store] class TearingStream(inner: OutputStream, allow: Int)
    extends OutputStream {
  private var remaining = allow
  override def write(b: Int): Unit =
    if (remaining > 0) { inner.write(b); remaining -= 1 }
    else throw new IOException("simulated device full")
  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    val n = math.min(len, remaining)
    if (n > 0) { inner.write(b, off, n); remaining -= n }
    if (len > n) throw new IOException("simulated device full")
  }
  override def flush(): Unit = inner.flush()
  override def close(): Unit = inner.close()
}
