package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Vacuum vs a same-version LOSER still writing (found live by
  * StreamChaosBlast): a writer attempting version v races a rival that
  * commits v first — the loser's attempt dir then sits at
  * `vNum == latest`, unreferenced, and the pre-fix sweep (whose only
  * in-flight guard was `vNum <= latest`) deleted it WHILE the loser's
  * own census/stats read was scanning it (FileNotFoundException inside
  * the loser's own write path instead of a clean OCC retry). The fix:
  * a dir NO manifest has ever referenced reclaims only past the
  * torn-claim grace; dirs any manifest (kept or dropped) references
  * keep immediate reclaim.
  */
class VacuumInFlightSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a young never-committed attempt dir at vNum == latest survives vacuum; an aged one reclaims") {
    val root = Files.createTempDirectory("graft-vacflight").toString + "/t"
    SnapshotStore.init(spark, root,
      (1L to 8L).map(k => (k, s"v$k")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root, Seq((1L, "x")).toDF("k", "v"),
      Seq("k"), SnapshotStore.upsertMerge(Seq("k")))
    val latest = SnapshotStore.latestVersion(spark, root).get
    val fs = fsOf(root)

    // a same-version loser mid-write: its attempt dir carries the
    // CURRENT latest version number and no manifest references it
    val loser = new Path(root, f"v=$latest%d-deadbeef/_graft_bucket=0")
    fs.mkdirs(loser)
    fs.create(new Path(loser, "part-00000-inflight.snappy.parquet"), true).close()

    SnapshotStore.vacuum(spark, root): Unit
    assert(fs.exists(loser),
      "vacuum reclaimed a YOUNG never-committed attempt dir — a " +
        "same-version loser's in-flight write would lose its files")

    // aged past the grace it is a crashed attempt's leftover: reclaimed
    val old = System.currentTimeMillis() - SnapshotStore.reclaimGraceMs - 60000L
    fs.setTimes(loser.getParent, old, old)
    SnapshotStore.vacuum(spark, root): Unit
    assert(!fs.exists(loser.getParent),
      "an AGED never-committed attempt dir must still reclaim")
  }

  test("vacuum tolerates an in-flight checkpoint's cp-<v>.tmp-<token> attempt dir") {
    val root = Files.createTempDirectory("graft-vactmp").toString + "/t"
    SnapshotStore.init(spark, root,
      (1L to 8L).map(k => (k, s"v$k")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root, Seq((1L, "x")).toDF("k", "v"),
      Seq("k"), SnapshotStore.upsertMerge(Seq("k")))
    SnapshotStore.checkpoint(spark, root): Unit
    val fs = fsOf(root)
    // a RACING checkpoint publish mid-flight: its private attempt dir
    // starts with cp- but is not a published checkpoint — the
    // below-floor sweep used to NumberFormatException on it
    val tmp = new Path(root, "_commits/cp-00000000000000000009.tmp-cafe01")
    fs.mkdirs(tmp)
    SnapshotStore.vacuum(spark, root): Unit // must not throw
    assert(fs.exists(tmp), "a YOUNG in-flight checkpoint attempt must survive")
  }

  test("dirs referenced by dropped manifests keep immediate reclaim (no age gate)") {
    val root = Files.createTempDirectory("graft-vacdropped").toString + "/t"
    SnapshotStore.init(spark, root,
      (1L to 8L).map(k => (k, s"v$k")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    val v0Dir = fsOf(root).listStatus(new Path(root)).toSeq
      .map(_.getPath).filter(_.getName.startsWith("v=0-"))
    assert(v0Dir.size == 1)
    // rewrite both buckets so v0's files are superseded, then vacuum
    // with keepLast=1: v0's manifest drops and its JUST-WRITTEN (young)
    // data dirs must reclaim immediately — the age gate is ONLY for
    // never-committed dirs
    SnapshotStore.commitDelta(spark, root,
      (1L to 8L).map(k => (k, s"w$k")).toDF("k", "v"),
      Seq("k"), SnapshotStore.upsertMerge(Seq("k")))
    SnapshotStore.checkpoint(spark, root): Unit
    SnapshotStore.vacuum(spark, root): Unit
    assert(!fsOf(root).exists(v0Dir.head),
      "superseded committed dirs must reclaim immediately")
  }
}
