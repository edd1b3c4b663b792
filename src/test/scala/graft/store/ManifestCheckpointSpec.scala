package graft.store

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scd1

/** Delta manifests + columnar checkpoints: commit metadata must be
  * O(touched buckets), reconstruction bounded by the checkpoint
  * interval, and every read bit-identical to the full-manifest world.
  */
class ManifestCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-cp-$tag").toString

  private val merge = (cur: org.apache.spark.sql.DataFrame,
                       delta: org.apache.spark.sql.DataFrame) =>
    Scd1.merge(cur, delta, Seq("k"), Seq(col("ts").desc))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.select("k", "v", "ts").as[(Long, String, Long)].collect().toSet

  private def withInterval[A](n: Long)(body: => A): A = {
    sys.props("graft.snapshot.checkpointInterval") = n.toString
    try body finally sys.props.remove("graft.snapshot.checkpointInterval"): Unit
  }

  test("commits write O(touched-bucket) delta manifests; checkpoints appear on cadence; reads identical") {
    withInterval(5) {
      val root = tmpDir("delta")
      val v0 = (1L to 64L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
      SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 16,
        statsCols = Seq("ts"))
      (1L to 12L).foreach { i =>
        SnapshotStore.commitDelta(spark, root,
          Seq((i, s"u$i", 100L + i)).toDF("k", "v", "ts"), Seq("k"), merge)
      }

      // a one-key commit's manifest lists exactly ONE bucket entry —
      // not the 16-bucket full state
      val m6 = Files.readAllLines(
        Paths.get(root, "_commits", f"${6L}%020d")).asScala.toSeq
      assert(m6.exists(_ == "delta:5"), s"not a delta manifest: $m6")
      val entryLines = m6.filter(_.matches("^\\d+\\t.*"))
      assert(entryLines.size == 1, s"expected 1 touched bucket, got: $entryLines")

      // checkpoints on the cadence (5 and 10), complete (_SUCCESS)
      Seq(5L, 10L).foreach { v =>
        assert(Files.exists(Paths.get(root, "_commits", f"cp-$v%020d", "_SUCCESS")),
          s"missing checkpoint at $v")
      }

      // reconstruction: latest and mid-chain versions both exact
      val expected = (1L to 64L).map { k =>
        if (k <= 12L) (k, s"u$k", 100L + k) else (k, s"v$k", k)
      }.toSet
      assert(rows(SnapshotStore.read(spark, root)) == expected)
      val at3 = (1L to 64L).map { k =>
        if (k <= 3L) (k, s"u$k", 100L + k) else (k, s"v$k", k)
      }.toSet
      assert(rows(SnapshotStore.readVersion(spark, root, 3L)) == at3)

      // stats pruning works against a reconstructed manifest
      assert(rows(SnapshotStore.readRange(spark, root, "ts", 101L, 102L)) ==
        Set((1L, "u1", 101L), (2L, "u2", 102L)))
    }
  }

  test("vacuum writes a verified retention-floor checkpoint; kept versions reconstruct without old manifests") {
    withInterval(1000) { // no cadence checkpoints: the floor one is vacuum's
      val root = tmpDir("floor")
      SnapshotStore.init(spark, root,
        (1L to 30L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"),
        Seq("k"), numBuckets = 4, statsCols = Seq("ts"))
      (1L to 9L).foreach { i =>
        SnapshotStore.commitDelta(spark, root,
          Seq((i, s"u$i", 100L + i)).toDF("k", "v", "ts"), Seq("k"), merge)
      }
      assert(SnapshotStore.vacuum(spark, root, keepLast = 3) > 0)
      // v10 = the floor-advance's empty serialization commit
      assert(SnapshotStore.versions(spark, root) == Seq(7L, 8L, 9L, 10L))
      // the floor version's manifest is a delta, so vacuum must have
      // checkpointed it before dropping its chain
      assert(Files.exists(Paths.get(root, "_commits", f"cp-${7L}%020d", "_SUCCESS")))

      // every kept version still reads exactly (floor via checkpoint,
      // the rest via checkpoint + delta tail)
      (7L to 9L).foreach { v =>
        val expect = (1L to 30L).map { k =>
          if (k <= v) (k, s"u$k", 100L + k) else (k, s"v$k", k)
        }.toSet
        assert(rows(SnapshotStore.readVersion(spark, root, v)) == expect, s"version $v")
      }
      // the change feed still diffs across the kept range
      val ch = ChangeFeed.readChanges(spark, root, Seq("k"), 7L, 9L)
        .select(col("k"), col(ChangeFeed.ChangeType)).as[(Long, String)]
        .collect().toSet
      assert(ch == Set(
        (8L, ChangeFeed.UpdatePre), (8L, ChangeFeed.UpdatePost),
        (9L, ChangeFeed.UpdatePre), (9L, ChangeFeed.UpdatePost)))
      // time travel below the floor is gone, with a clear failure
      intercept[Exception](SnapshotStore.readVersion(spark, root, 3L))
    }
  }

  test("the delta chain spans tombstones, compaction, restore and rebucket") {
    withInterval(4) {
      val root = tmpDir("mixed")
      SnapshotStore.init(spark, root,
        (1L to 40L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"),
        Seq("k"), numBuckets = 4, statsCols = Seq("ts"))
      SnapshotStore.commitDeletes(spark, root, Seq(5L, 6L).toDF("k"), Seq("k")) // v1
      SnapshotStore.commitDelta(spark, root,
        Seq((1L, "x", 100L)).toDF("k", "v", "ts"), Seq("k"), merge)             // v2
      SnapshotStore.compact(spark, root, minFiles = 2)                          // v3 (folds tombs)
      val expectAfter = rows(SnapshotStore.read(spark, root))
      SnapshotStore.restore(spark, root, 0L)                                    // v4 (+checkpoint)
      assert(rows(SnapshotStore.read(spark, root)) ==
        (1L to 40L).map(k => (k, s"v$k", k)).toSet)
      SnapshotStore.restore(spark, root, 3L)                                    // v5
      assert(rows(SnapshotStore.read(spark, root)) == expectAfter)
      SnapshotStore.rebucket(spark, root, Seq("k"), 8)                          // v6
      assert(rows(SnapshotStore.read(spark, root)) == expectAfter)
      assert(SnapshotStore.readManifest(spark, root, 6L).numBuckets == 8)
      // point reads against the rebucketed, delta-reconstructed state
      assert(rows(SnapshotStore.readForKeys(spark, root, Seq("k"),
        Seq(Seq(1L), Seq(5L)))) == Set((1L, "x", 100L)))
    }
  }

  test("concurrent checkpoints of one version serialize through the claim") {
    // two FileOutputCommitter jobs sharing cp-<v> clobber each other's
    // _temporary attempts (a restore's auto-checkpoint racing CALL
    // system.checkpoint — the contract-op chaos soak crashed there);
    // the createExclusive claim admits one writer, the rest await the
    // deterministic _SUCCESS
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val root = tmpDir("cp-race")
    val v0 = (1L to 50L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 4)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val futs = (0 until 8).map { _ =>
      Future { gate.await(); SnapshotStore.checkpoint(spark, root) }
    }
    gate.countDown()
    val vs = Await.result(Future.sequence(futs), 120.seconds)
    assert(vs.forall(_ == 0L))
    assert(new java.io.File(s"$root/_commits/cp-${"%020d".format(0)}/_SUCCESS").exists())
    // the claim is consumed; the checkpointed state reads back intact
    assert(!new java.io.File(s"$root/_commits").listFiles()
      .exists(_.getName.startsWith("claim-cp-")))
    assert(rows(SnapshotStore.read(spark, root)).size == 50)
  }

  test("a crashed claimer's stale claim defers a writer briefly, never for the manifest lease; vacuum sweeps the orphans") {
    // r13's reclaim had a TOCTOU (stale-check then delete could remove a
    // claim a fresh claimer just re-created → two FileOutputCommitter
    // jobs on one dir) and a liveness hole (a crashed claimer stalled
    // every cadence writer for the 10-min manifest lease). Now the claim
    // is work-dedup only: past the SHORT checkpoint grace a waiter
    // writes its own private tmp attempt and atomically renames it into
    // place — it never deletes the foreign claim; vacuum sweeps it.
    val root = tmpDir("stale-claim")
    SnapshotStore.init(spark, root,
      (1L to 20L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = 4)
    val commits = new java.io.File(s"$root/_commits")
    val claim = new java.io.File(commits, f"claim-cp-${0L}%020d")
    assert(claim.createNewFile())
    // aged past the checkpoint claim grace (15 s default) but far
    // inside the 10-min manifest lease — the old code would spin here
    assert(claim.setLastModified(System.currentTimeMillis() - 30000L))
    val t0 = System.nanoTime()
    assert(SnapshotStore.checkpoint(spark, root) == 0L)
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(elapsedSec < 14.0, s"writer stalled ${elapsedSec}s behind a dead claim")
    assert(new java.io.File(s"$root/_commits/cp-${"%020d".format(0)}/_SUCCESS").exists())
    // the foreign claim was NOT deleted by the takeover (no TOCTOU window)
    assert(claim.exists())
    // …and a crashed attempt's private tmp dir is equally inert
    val strayTmp = new java.io.File(commits, s"cp-${"%020d".format(0)}.tmp-deadbeef")
    assert(strayTmp.mkdir())
    // vacuum reclaims both once aged past the manifest lease
    Seq(claim, strayTmp).foreach(f =>
      assert(f.setLastModified(System.currentTimeMillis() - 11 * 60 * 1000L)))
    SnapshotStore.vacuum(spark, root, keepLast = 1)
    assert(!claim.exists(), "vacuum left the orphaned claim")
    assert(!strayTmp.exists(), "vacuum left the orphaned tmp attempt")
    // the published checkpoint itself is untouched
    assert(new java.io.File(s"$root/_commits/cp-${"%020d".format(0)}/_SUCCESS").exists())
    assert(rows(SnapshotStore.read(spark, root)).size == 20)
  }
}
