package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scd1

class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-snap-$tag").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.select("k", "v", "ts").as[(Long, String, Long)].collect().toSet

  private val merge = (cur: org.apache.spark.sql.DataFrame,
                       delta: org.apache.spark.sql.DataFrame) =>
    Scd1.merge(cur, delta, Seq("k"), Seq(col("ts").desc))

  test("init + read round-trips; commitDelta merges and bumps the version") {
    val root = tmpDir("basic")
    val v0 = (1L to 100L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ts")
    assert(SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 8) == 0L)
    assert(rows(SnapshotStore.read(spark, root)) == rows(v0))

    // update 3 keys, insert 2 new ones
    val delta = Seq((1L, "v1b", 2L), (2L, "v2b", 2L), (3L, "v3b", 2L),
      (101L, "v101", 2L), (102L, "v102", 2L)).toDF("k", "v", "ts")
    val v1 = SnapshotStore.commitDelta(spark, root, delta, Seq("k"), merge)
    assert(v1 == 1L)
    val got = rows(SnapshotStore.read(spark, root))
    assert(got.size == 102)
    assert(got((1L, "v1b", 2L)) && got((101L, "v101", 2L)))
    assert(got((4L, "v4", 1L))) // untouched key intact
  }

  test("copy-on-write: untouched bucket files are re-pointed, not rewritten") {
    val root = tmpDir("cow")
    val v0 = (1L to 200L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 8)
    val m0 = SnapshotStore.readManifest(spark, root, 0L)

    val delta = Seq((1L, "v1b", 2L)).toDF("k", "v", "ts")
    SnapshotStore.commitDelta(spark, root, delta, Seq("k"), merge)
    val m1 = SnapshotStore.readManifest(spark, root, 1L)

    val touched = m1.buckets.filter { case (_, dir) => dir.startsWith("v=1/") }
    assert(touched.size == 1) // exactly the one bucket key 1 hashes to
    // every other bucket still points at its ORIGINAL v=0 directory
    (m1.buckets -- touched.keySet).foreach { case (b, dir) =>
      assert(dir == m0.buckets(b))
    }
  }

  test("readForKeys prunes to the key's buckets and returns exactly the requested rows") {
    val root = tmpDir("lookup")
    val v0 = (1L to 500L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 16)
    val got = SnapshotStore.readForKeys(spark, root, Seq("k"), Seq(Seq(7L), Seq(400L)))
    assert(rows(got) == Set((7L, "v7", 1L), (400L, "v400", 1L)))
    // the scan under the hood touches at most 2 of the 16 bucket dirs
    val scanned = got.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.flatMap(_.relation.location.rootPaths.map(_.toString)).distinct
    assert(scanned.size <= 2, s"expected ≤2 bucket dirs, scanned $scanned")
  }

  test("readers never see a torn state: uncommitted data dirs are invisible") {
    val root = tmpDir("crash")
    val v0 = (1L to 50L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 4)
    // simulate a writer that crashed after writing data, before commit
    Seq((999L, "ghost", 9L)).toDF("k", "v", "ts")
      .write.parquet(Paths.get(root, "v=1", s"${SnapshotStore.BucketCol}=0").toString)
    assert(SnapshotStore.latestVersion(spark, root).contains(0L))
    assert(!rows(SnapshotStore.read(spark, root)).exists(_._1 == 999L))
  }

  test("time travel: every committed version stays readable until vacuumed") {
    val root = tmpDir("tt")
    val v0 = (1L to 20L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 4)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "v1b", 2L)).toDF("k", "v", "ts"), Seq("k"), merge)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "v1c", 3L)).toDF("k", "v", "ts"), Seq("k"), merge)

    assert(SnapshotStore.versions(spark, root) == Seq(0L, 1L, 2L))
    assert(rows(SnapshotStore.readVersion(spark, root, 0L))((1L, "v1", 1L)))
    assert(rows(SnapshotStore.readVersion(spark, root, 1L))((1L, "v1b", 2L)))
    assert(rows(SnapshotStore.readVersion(spark, root, 2L))((1L, "v1c", 3L)))
  }

  test("vacuum removes orphans and unreferenced old versions; latest stays readable") {
    val root = tmpDir("vac")
    val v0 = (1L to 100L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 4)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "v1b", 2L)).toDF("k", "v", "ts"), Seq("k"), merge)
    // orphan from a crashed writer at an old version
    Seq((999L, "ghost", 9L)).toDF("k", "v", "ts")
      .write.parquet(Paths.get(root, "v=1", s"${SnapshotStore.BucketCol}=99").toString)

    val expected = rows(SnapshotStore.read(spark, root))
    assert(SnapshotStore.vacuum(spark, root, keepLast = 1) > 0)
    assert(rows(SnapshotStore.read(spark, root)) == expected)
    assert(SnapshotStore.versions(spark, root) == Seq(1L))
    assert(!Files.exists(Paths.get(root, "v=1", s"${SnapshotStore.BucketCol}=99")))
    // v=0 bucket dirs still referenced by v1's manifest must survive
    val m1 = SnapshotStore.readManifest(spark, root, 1L)
    m1.buckets.values.foreach(dir => assert(Files.exists(Paths.get(root, dir))))
  }

  test("streaming scd1SnapshotSink commits one atomic version per micro-batch") {
    val root = tmpDir("stream")
    val ckpt = tmpDir("stream-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val q = SnapshotStore.scd1SnapshotSink(
      mem.toDF().toDF("k", "v", "ts"), root, ckpt,
      Seq("k"), Seq(col("ts").desc), numBuckets = 4)
    try {
      mem.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      assert(rows(SnapshotStore.read(spark, root)) ==
        Set((1L, "a", 1L), (2L, "b", 1L)))
      mem.addData((1L, "a2", 2L), (3L, "c", 2L))
      q.processAllAvailable()
      assert(rows(SnapshotStore.read(spark, root)) ==
        Set((1L, "a2", 2L), (2L, "b", 1L), (3L, "c", 2L)))
      assert(SnapshotStore.versions(spark, root) == Seq(0L, 1L))
    } finally q.stop()
  }

  test("aggSnapshotSink maintains a materialized aggregate == full recompute") {
    val root = tmpDir("mv")
    val ckpt = tmpDir("mv-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Long)]
    // rows arrive as (day, revenue_cents, n_orders=1): partials and raw
    // rows share the schema, so one re-aggregation serves both merges
    val q = SnapshotStore.aggSnapshotSink(
      mem.toDF().toDF("day", "revenue_cents", "n_orders"), root, ckpt,
      Seq("day"),
      Seq(sum(col("revenue_cents")).as("revenue_cents"),
        sum(col("n_orders")).as("n_orders")),
      numBuckets = 4)
    try {
      val b1 = Seq(("d1", 100L, 1L), ("d1", 250L, 1L), ("d2", 40L, 1L))
      val b2 = Seq(("d1", 60L, 1L), ("d3", 10L, 1L))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val got = SnapshotStore.read(spark, root)
        .select("day", "revenue_cents", "n_orders")
        .as[(String, Long, Long)].collect().toSet
      assert(got == Set(("d1", 410L, 3L), ("d2", 40L, 1L), ("d3", 10L, 1L)))
      assert(SnapshotStore.versions(spark, root) == Seq(0L, 1L))
    } finally q.stop()
  }

  test("scd2SnapshotSink: incremental history fold equals full rebuild, atomically versioned") {
    val root = tmpDir("scd2")
    val ckpt = tmpDir("scd2-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val q = SnapshotStore.scd2SnapshotSink(
      mem.toDF().toDF("k", "v", "ts"), root, ckpt,
      Seq("k"), ts = "ts", tiebreak = "v", numBuckets = 4)
    try {
      val b1 = Seq((1L, "a", 1L), (2L, "b", 1L))
      val b2 = Seq((1L, "a2", 5L), (3L, "c", 5L))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()

      val expected = graft.operators.Scd2.buildHistory(
        (b1 ++ b2).toDF("k", "v", "ts"), Seq("k"), "ts", "v")
        .select("k", "v", "ts", "eff_start_ts", "eff_end_ts", "current_flag")
        .as[(Long, String, Long, Long, Option[Long], Boolean)].collect().toSet
      val got = SnapshotStore.read(spark, root)
        .select("k", "v", "ts", "eff_start_ts", "eff_end_ts", "current_flag")
        .as[(Long, String, Long, Long, Option[Long], Boolean)].collect().toSet
      assert(got == expected)
      assert(SnapshotStore.versions(spark, root) == Seq(0L, 1L))

      // redelivery of batch 2 (at-least-once replay) leaves the history unchanged
      SnapshotStore.commitDelta(spark, root, b2.toDF("k", "v", "ts"), Seq("k"),
        (cur, delta) => graft.operators.Scd2.applyDelta(cur, delta, Seq("k"), "ts", "v"))
      val replayed = SnapshotStore.read(spark, root)
        .select("k", "v", "ts", "eff_start_ts", "eff_end_ts", "current_flag")
        .as[(Long, String, Long, Long, Option[Long], Boolean)].collect().toSet
      assert(replayed == expected)
    } finally q.stop()
  }
}
