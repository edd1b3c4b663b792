package graft.store

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scd1

/** A local FS registered under its own scheme (`pdel:`) whose rename
  * simulates the vacuum/rebase atomicity hole: immediately after a
  * successful ATTEMPT-DIR rename (the tryRebase re-point — src and dst
  * both `v=<n>-<token>` with the same token), it deletes one bucket
  * subdirectory of the renamed dir, exactly the residue a recursive
  * vacuum delete that started before the rename leaves behind. Armed
  * once via [[PartialDeleteFS.sabotageNext]].
  */
class PartialDeleteFS extends RawLocalFileSystem {
  override def getUri: URI = URI.create("pdel:///")
  private def attemptToken(p: Path): Option[String] = {
    val n = p.getName
    if (n.startsWith("v=") && n.contains("-")) Some(n.substring(n.indexOf('-') + 1))
    else None
  }
  override def rename(src: Path, dst: Path): Boolean = {
    val ok = super.rename(src, dst)
    val tok = attemptToken(src)
    if (ok && tok.isDefined && tok == attemptToken(dst) &&
        PartialDeleteFS.sabotageNext.compareAndSet(true, false)) {
      listStatus(dst).filter(_.getPath.getName.startsWith(SnapshotStore.BucketCol + "="))
        .headOption.foreach(s => delete(s.getPath, true))
      PartialDeleteFS.sabotaged.set(true)
    }
    ok
  }
}

object PartialDeleteFS {
  val sabotageNext = new AtomicBoolean(false)
  val sabotaged = new AtomicBoolean(false)
}

/** Latches for the base-empty-bucket commitDeletes race (top-level
  * statics: task closures must not capture latches).
  */
object DeleteInsertRaceLatches {
  val aStarted = new CountDownLatch(1)
  val go = new CountDownLatch(1)
}

/** The two commit-protocol races the rebase path must refuse:
  * a vacuum-mangled renamed attempt dir, and a winner's insert into a
  * bucket that was empty at the delete's base.
  */
class RaceReverifySpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-rv-$tag").toString

  private val plainMerge = (cur: org.apache.spark.sql.DataFrame,
                            delta: org.apache.spark.sql.DataFrame) =>
    Scd1.merge(cur, delta, Seq("k"), Seq(col("ts").desc))

  private def bucketOf(k: Long, n: Int): Int =
    Seq(k).toDF("k").select(pmod(hash(col("k")), lit(n))).as[Int].head()

  test("rebase re-verify: a vacuum-mangled renamed attempt dir refuses to commit and recomputes") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.pdel.impl", classOf[PartialDeleteFS].getName)
    val root = "pdel:" + tmpDir("reverify")
    val numBuckets = 4
    // two keys in different buckets → the loser qualifies for a rebase
    val ks = (1L to 50L).map(k => k -> bucketOf(k, numBuckets))
    val kA = ks.head._1
    val kB = ks.find(_._2 != ks.head._2).get._1
    SnapshotStore.init(spark, root,
      (1L to 50L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = numBuckets)

    val mergeRuns = new AtomicInteger(0)
    val aMerging = new CountDownLatch(1)
    val bCommitted = new CountDownLatch(1)
    val fut = Future {
      SnapshotStore.commitDelta(spark, root,
        Seq((kA, "from-A", 100L)).toDF("k", "v", "ts"), Seq("k"),
        (cur, delta) => {
          if (mergeRuns.incrementAndGet() == 1) {
            aMerging.countDown()
            assert(bCommitted.await(60, TimeUnit.SECONDS))
          }
          plainMerge(cur, delta)
        })
    }
    assert(aMerging.await(60, TimeUnit.SECONDS))
    SnapshotStore.commitDelta(spark, root,
      Seq((kB, "from-B", 100L)).toDF("k", "v", "ts"), Seq("k"), plainMerge)
    // arm the sabotage: A is about to lose, rebase-rename, and find
    // its renamed dir half-deleted
    PartialDeleteFS.sabotaged.set(false)
    PartialDeleteFS.sabotageNext.set(true)
    bCommitted.countDown()
    val vA = Await.result(fut, 120.seconds)

    assert(PartialDeleteFS.sabotaged.get(), "the rename hook must have fired")
    assert(mergeRuns.get() == 2,
      "a mangled renamed dir must force a recompute, not commit as-is")
    assert(vA == 2L)
    // no committed manifest references a missing directory: the whole
    // table (and each version) reads back complete
    val now = SnapshotStore.read(spark, root).select("k", "v", "ts")
      .as[(Long, String, Long)].collect().toSet
    assert(now((kA, "from-A", 100L)) && now((kB, "from-B", 100L)) && now.size == 50)
    (0L to 2L).foreach { v =>
      assert(SnapshotStore.readVersion(spark, root, v).count() == 50L)
    }
  }

  test("commitDeletes vs concurrent insert into a base-empty bucket: rebase refuses, recompute deletes") {
    val numBuckets = 4
    // kX hashes to a bucket we keep EMPTY at init; kY to a populated one
    val pool = (1L to 200L).map(k => k -> bucketOf(k, numBuckets))
    val bEmpty = pool.head._2
    val kX = pool.head._1
    val populated = pool.filter(_._2 != bEmpty).map(_._1)
    val kY = populated.head
    val root = tmpDir("delins")
    SnapshotStore.init(spark, root,
      populated.map(k => (k, s"v$k", k)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = numBuckets)
    val n0 = populated.size.toLong

    // A deletes {kX, kY}: kX's bucket is empty at A's base, so A's
    // census must still count it as TOUCHED for rebase disjointness
    val delKeys = spark.sparkContext.parallelize(Seq(kX, kY), 1).map { k =>
      DeleteInsertRaceLatches.aStarted.countDown()
      assert(DeleteInsertRaceLatches.go.await(60, TimeUnit.SECONDS))
      k
    }.toDF("k")
    val fut = Future { SnapshotStore.commitDeletes(spark, root, delKeys, Seq("k")) }
    assert(DeleteInsertRaceLatches.aStarted.await(60, TimeUnit.SECONDS))
    // B inserts kX itself into the bucket that was empty at A's base
    val vB = SnapshotStore.commitDelta(spark, root,
      Seq((kX, "inserted-by-B", 100L)).toDF("k", "v", "ts"), Seq("k"), plainMerge)
    DeleteInsertRaceLatches.go.countDown()
    val vA = Await.result(fut, 120.seconds)

    assert(vB == 1L && vA == 2L,
      "the delete must commit ABOVE the insert, not no-op at its stale base")
    val now = SnapshotStore.read(spark, root).select("k", "v", "ts")
      .as[(Long, String, Long)].collect().toSet
    // delete-after-insert is the order observers see: kX is gone
    assert(!now.exists(_._1 == kX), "the concurrently inserted key must be deleted")
    assert(!now.exists(_._1 == kY))
    assert(now.size == n0 - 1)
    // at version 1 (B's commit) kX existed — the history shows I then D
    assert(SnapshotStore.readVersion(spark, root, 1L)
      .where(col("k") === kX).count() == 1L)
  }
}
