package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scd1

/** Zero-copy clones and version restore: O(manifest) operations whose
  * correctness rests on the commit arbiter — no data moves until a
  * bucket is genuinely rewritten.
  */
class CloneRestoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-cr-$tag").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.select("k", "v", "ts").as[(Long, String, Long)].collect().toSet

  private val merge = (cur: org.apache.spark.sql.DataFrame,
                       delta: org.apache.spark.sql.DataFrame) =>
    Scd1.merge(cur, delta, Seq("k"), Seq(col("ts").desc))

  test("restore rolls back as a NEW commit; history, pruning and later deltas compose") {
    val root = tmpDir("restore")
    val v0 = (1L to 60L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 4, statsCols = Seq("ts"))
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "bad1", 100L), (61L, "bad61", 100L)).toDF("k", "v", "ts"), Seq("k"), merge)
    SnapshotStore.commitDeletes(spark, root, Seq(5L).toDF("k"), Seq("k"))
    assert(rows(SnapshotStore.read(spark, root)).size == 60) // 61 rows - 5 deleted

    // undo both bad commits
    val rv = SnapshotStore.restore(spark, root, 0L)
    assert(rv == 3L)
    assert(rows(SnapshotStore.read(spark, root)) == rows(v0))
    // the bad version is still time-travelable above the restore
    assert(rows(SnapshotStore.readVersion(spark, root, 1L))
      .exists(_._2 == "bad1"))
    // stats pruning works against the restored manifest
    assert(rows(SnapshotStore.readRange(spark, root, "ts", 1L, 3L)) ==
      Set((1L, "v1", 1L), (2L, "v2", 2L), (3L, "v3", 3L)))
    // restoring to the current version is a no-op
    assert(SnapshotStore.restore(spark, root, 3L) == 3L)
    // later deltas compose on the restored base
    SnapshotStore.commitDelta(spark, root,
      Seq((2L, "v2c", 200L)).toDF("k", "v", "ts"), Seq("k"), merge)
    val now = rows(SnapshotStore.read(spark, root))
    assert(now((2L, "v2c", 200L)) && now.size == 60)
    // vacuum keeps the restored dirs referenced — reads stay intact
    SnapshotStore.vacuum(spark, root, keepLast = 1)
    assert(rows(SnapshotStore.read(spark, root)) == now)
  }

  test("restore keeps CURRENT txn marks: a rolled-back batch's redelivery stays a no-op") {
    val root = tmpDir("restore-txn")
    val v0 = (1L to 20L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "b7", 50L)).toDF("k", "v", "ts"), Seq("k"), merge,
      txn = Some("w" -> 7L))
    SnapshotStore.restore(spark, root, 0L)
    // the at-least-once redelivery of batch 7 after the rollback: seen
    // before, so still skipped (no silent re-apply on the restored base)
    val before = SnapshotStore.latestVersion(spark, root)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "b7", 50L)).toDF("k", "v", "ts"), Seq("k"), merge,
      txn = Some("w" -> 7L))
    assert(SnapshotStore.latestVersion(spark, root) == before)
    assert(!rows(SnapshotStore.read(spark, root)).exists(_._2 == "b7"))
  }

  test("cloneTable: zero data files under the clone; reads identical; divergence is isolated") {
    val src = tmpDir("clone-src")
    val dst = tmpDir("clone-dst")
    val v0 = (1L to 80L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, src, v0, Seq("k"), numBuckets = 4, statsCols = Seq("ts"))
    SnapshotStore.commitDeletes(spark, src, Seq(9L).toDF("k"), Seq("k"))

    assert(SnapshotStore.cloneTable(spark, src, dst) == 0L)
    // identical content, including the tombstone subtraction
    assert(rows(SnapshotStore.read(spark, dst)) == rows(SnapshotStore.read(spark, src)))
    // the clone holds ONLY metadata (manifest + retention breadcrumb)
    // — no v= data dirs were written
    val local = Files.list(Paths.get(dst)).toArray.map(_.toString.split('/').last)
    assert(!local.exists(_.startsWith("v=")), s"clone root holds data: $local")
    assert(local.contains("_commits") && local.contains("_clone_source"))
    // cloning onto an existing table refuses
    intercept[IllegalArgumentException] {
      SnapshotStore.cloneTable(spark, src, dst)
    }

    // clone-side delta: only touched buckets re-home; source unchanged
    SnapshotStore.commitDelta(spark, dst,
      Seq((1L, "clone1", 500L)).toDF("k", "v", "ts"), Seq("k"), merge)
    assert(rows(SnapshotStore.read(spark, dst))((1L, "clone1", 500L)))
    assert(!rows(SnapshotStore.read(spark, src)).exists(_._2 == "clone1"))
    // source-side delta: clone does not see it
    SnapshotStore.commitDelta(spark, src,
      Seq((2L, "src2", 500L)).toDF("k", "v", "ts"), Seq("k"), merge)
    assert(!rows(SnapshotStore.read(spark, dst)).exists(_._2 == "src2"))

    // the clone's vacuum never reaches into the source
    val srcFiles = Files.walk(Paths.get(src)).toArray.length
    SnapshotStore.vacuum(spark, dst, keepLast = 1)
    assert(Files.walk(Paths.get(src)).toArray.length == srcFiles)
    assert(rows(SnapshotStore.read(spark, dst))((1L, "clone1", 500L)))
  }

  test("materialize re-homes every clone bucket; the source can then vanish") {
    val src = tmpDir("mat-src")
    val dst = tmpDir("mat-dst")
    val v0 = (1L to 40L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, src, v0, Seq("k"), numBuckets = 4)
    SnapshotStore.cloneTable(spark, src, dst)
    val expected = rows(SnapshotStore.read(spark, dst))

    val mv = SnapshotStore.materialize(spark, dst, Seq("k"))
    assert(mv == 1L)
    // a second materialize is a no-op (already fully local)
    assert(SnapshotStore.materialize(spark, dst, Seq("k")) == 1L)

    // cut the dependency for real: delete the source table wholesale
    def rmRf(p: java.nio.file.Path): Unit = {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => { Files.delete(q); () })
    }
    rmRf(Paths.get(src))
    assert(rows(SnapshotStore.read(spark, dst)) == expected)
  }

  test("clone holds a retention consumer on the source; materialize releases it") {
    val src = tmpDir("ret-src")
    val dst = tmpDir("ret-dst")
    val v0 = (1L to 40L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, src, v0, Seq("k"), numBuckets = 4)
    SnapshotStore.cloneTable(spark, src, dst)
    // source moves on and vacuums aggressively — the clone's consumer
    // is the retention floor, so nothing it references is reclaimed
    SnapshotStore.commitDelta(spark, src,
      Seq((1L, "x", 100L)).toDF("k", "v", "ts"), Seq("k"), merge)
    SnapshotStore.commitDelta(spark, src,
      Seq((2L, "y", 101L)).toDF("k", "v", "ts"), Seq("k"), merge)
    assert(SnapshotStore.vacuum(spark, src, keepLast = 1) == 0)
    assert(rows(SnapshotStore.read(spark, dst)) == rows(v0))

    // materialize re-homes every bucket AND releases the hold: the
    // next source vacuum reclaims the old history for real
    SnapshotStore.materialize(spark, dst, Seq("k"))
    assert(SnapshotStore.vacuum(spark, src, keepLast = 1) > 0)
    assert(rows(SnapshotStore.read(spark, dst)) == rows(v0))
    assert(rows(SnapshotStore.read(spark, src)).size == 40) // 40 keys, 2 upserted in place
  }

  test("releaseClone frees the source when an un-materialized clone is dropped") {
    val src = tmpDir("rel-src")
    val dst = tmpDir("rel-dst")
    SnapshotStore.init(spark, src,
      (1L to 10L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"), Seq("k"), numBuckets = 2)
    SnapshotStore.cloneTable(spark, src, dst)
    SnapshotStore.commitDelta(spark, src,
      Seq((1L, "x", 50L)).toDF("k", "v", "ts"), Seq("k"), merge)
    assert(SnapshotStore.vacuum(spark, src, keepLast = 1) == 0) // held
    SnapshotStore.releaseClone(spark, dst)
    assert(SnapshotStore.vacuum(spark, src, keepLast = 1) > 0) // freed
    // idempotent / no-op on a non-clone
    SnapshotStore.releaseClone(spark, dst)
    SnapshotStore.releaseClone(spark, src)
  }

  test("restore refuses a pre-materialization version whose source was PARTIALLY reclaimed (bucket-dir probe)") {
    // r16 advice #5: vacuum reclaims at BUCKET-dir granularity when
    // only some of a version's buckets are dead, so probing each
    // foreign ref's v= PARENT let a partially-reclaimed source version
    // pass — restore then committed a version that dangles (FNF at
    // read). The probe now checks the referenced bucket dirs
    // themselves.
    val src = tmpDir("pv-src")
    val dst = tmpDir("pv-dst")
    val v0 = (1L to 40L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, src, v0, Seq("k"), numBuckets = 4)
    SnapshotStore.cloneTable(spark, src, dst)
    // materialize re-homes the data and RELEASES the retention hold —
    // from here the source owes the clone nothing
    SnapshotStore.materialize(spark, dst, Seq("k"))
    // a bucket-granular source sweep: ONE bucket dir of the fork-time
    // version dies; its v= parent (and sibling buckets) live on
    def rmRf(p: java.nio.file.Path): Unit =
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => { Files.delete(q); () })
    val v0dir = Files.list(Paths.get(src)).toArray.map(_.toString)
      .filter(_.split('/').last.startsWith("v=0")).head
    val bucketDirs = Files.list(Paths.get(v0dir)).toArray.map(_.toString)
      .filter(_.split('/').last.startsWith("_graft_bucket="))
    assert(bucketDirs.length > 1, s"need sibling buckets: ${bucketDirs.toSeq}")
    rmRf(Paths.get(bucketDirs.head))
    // restoring the clone to its pre-materialization version must
    // refuse LOUDLY — the parent still exists, but a referenced bucket
    // is gone and the restored version would dangle
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.restore(spark, dst, 0L)
    }
    assert(e.getMessage.contains("no longer exist"),
      s"wrong refusal: ${e.getMessage}")
  }
}
