package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scd1

class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-cdf-$tag").toString

  private val merge = (cur: org.apache.spark.sql.DataFrame,
                       delta: org.apache.spark.sql.DataFrame) =>
    Scd1.merge(cur, delta, Seq("k"), Seq(col("ts").desc))

  private def changes(root: String, from: Long, to: Long): Set[(Long, String, Long, String, Long)] =
    ChangeFeed.readChanges(spark, root, Seq("k"), from, to)
      .select("k", "v", "ts", ChangeFeed.ChangeType, ChangeFeed.CommitVersion)
      .as[(Long, String, Long, String, Long)].collect().toSet

  test("init is all inserts; an upsert yields update pre+post and insert; co-bucketed rows stay silent") {
    val root = tmpDir("basic")
    val v0 = (1L to 50L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 4)
    assert(changes(root, -1L, 0L) ==
      (1L to 50L).map(k => (k, s"v$k", 1L, ChangeFeed.Insert, 0L)).toSet)

    // update k=1, insert k=51 — every other key (including the ones
    // sharing k=1's rewritten bucket) must NOT appear
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "v1b", 2L), (51L, "v51", 2L)).toDF("k", "v", "ts"), Seq("k"), merge)
    assert(changes(root, 0L, 1L) == Set(
      (1L, "v1", 1L, ChangeFeed.UpdatePre, 1L),
      (1L, "v1b", 2L, ChangeFeed.UpdatePost, 1L),
      (51L, "v51", 2L, ChangeFeed.Insert, 1L)))
  }

  test("merge-on-read tombstone deletes surface as delete rows; a no-op rewrite of the same value is silent") {
    val root = tmpDir("del")
    val v0 = (1L to 30L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 4)
    SnapshotStore.commitDeletes(spark, root, Seq(Tuple1(7L)).toDF("k"), Seq("k"))
    assert(changes(root, 0L, 1L) == Set((7L, "v7", 1L, ChangeFeed.Delete, 1L)))

    // re-upserting the identical row where it already exists: the
    // bucket rewrites, but the diff sees value-equal rows — no change
    SnapshotStore.commitDelta(spark, root,
      Seq((2L, "v2", 1L)).toDF("k", "v", "ts"), Seq("k"), merge)
    assert(changes(root, 1L, 2L).isEmpty)
  }

  test("a multi-version range unions per-step diffs with their commit versions") {
    val root = tmpDir("range")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 1L)).toDF("k", "v", "ts"), Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root,
      Seq((2L, "b", 2L)).toDF("k", "v", "ts"), Seq("k"), merge)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "a2", 3L)).toDF("k", "v", "ts"), Seq("k"), merge)
    assert(changes(root, -1L, 2L) == Set(
      (1L, "a", 1L, ChangeFeed.Insert, 0L),
      (2L, "b", 2L, ChangeFeed.Insert, 1L),
      (1L, "a", 1L, ChangeFeed.UpdatePre, 2L),
      (1L, "a2", 3L, ChangeFeed.UpdatePost, 2L)))
    // a key deleted and re-inserted across steps shows both legs
    SnapshotStore.commitDeletes(spark, root, Seq(Tuple1(2L)).toDF("k"), Seq("k"))
    SnapshotStore.commitDelta(spark, root,
      Seq((2L, "b2", 5L)).toDF("k", "v", "ts"), Seq("k"), merge)
    assert(changes(root, 2L, 4L) == Set(
      (2L, "b", 2L, ChangeFeed.Delete, 3L),
      (2L, "b2", 5L, ChangeFeed.Insert, 4L)))
  }

  test("compaction rewrites buckets bit-identically and diffs to zero changes") {
    val root = tmpDir("compact")
    SnapshotStore.init(spark, root,
      (1L to 40L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "v1b", 99L)).toDF("k", "v", "ts"), Seq("k"), merge)
    val v = SnapshotStore.compact(spark, root, minFiles = 2)
    assert(v > 1L, "fixture must actually compact")
    assert(changes(root, 1L, v).isEmpty)
  }

  test("null transitions are changes; null keys join null-safely") {
    val root = tmpDir("nulls")
    val v0 = Seq((java.lang.Long.valueOf(1L), "a", 1L),
      (null.asInstanceOf[java.lang.Long], "n", 1L))
      .toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 2)
    // value a -> null for k=1; null-key row updated in place
    val delta = Seq((java.lang.Long.valueOf(1L), null.asInstanceOf[String], 2L),
      (null.asInstanceOf[java.lang.Long], "n2", 2L)).toDF("k", "v", "ts")
    SnapshotStore.commitDelta(spark, root, delta, Seq("k"), merge)
    val got = ChangeFeed.readChanges(spark, root, Seq("k"), 0L, 1L)
      .select("k", "v", ChangeFeed.ChangeType)
      .collect().map(r => (Option(r.get(0)), Option(r.getString(1)), r.getString(2))).toSet
    assert(got == Set(
      (Some(1L), Some("a"), ChangeFeed.UpdatePre),
      (Some(1L), None, ChangeFeed.UpdatePost),
      (None, Some("n"), ChangeFeed.UpdatePre),
      (None, Some("n2"), ChangeFeed.UpdatePost)))
  }

  test("consumer protocol: register at creation point, consume deltas once, redeliver only on missed advance") {
    val root = tmpDir("consumer")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 1L)).toDF("k", "v", "ts"), Seq("k"), numBuckets = 2)
    var seen = Vector.empty[(Long, Long, Long)] // (rows, from, to)
    def consume(): Option[(Long, Long)] =
      ChangeFeed.consumeChanges(spark, root, "sink-1", Seq("k")) { (df, f, t) =>
        seen :+= ((df.count(), f, t))
      }
    assert(consume().isEmpty && seen.isEmpty) // registration, nothing delivered
    assert(consume().isEmpty) // still nothing new

    SnapshotStore.commitDelta(spark, root,
      Seq((2L, "b", 2L)).toDF("k", "v", "ts"), Seq("k"), merge)
    SnapshotStore.commitDelta(spark, root,
      Seq((3L, "c", 3L)).toDF("k", "v", "ts"), Seq("k"), merge)
    assert(consume().contains((0L, 2L)))
    assert(seen == Vector((2L, 0L, 2L))) // both versions, one delivery
    assert(consume().isEmpty) // offset advanced — no redelivery

    // a consumer seeded at -1 bootstraps the full history
    ChangeFeed.seedConsumer(spark, root, "sink-2", -1L)
    var rows = -1L
    ChangeFeed.consumeChanges(spark, root, "sink-2", Seq("k")) { (df, _, _) =>
      rows = df.count()
    }
    assert(rows == 3L) // 3 inserts across versions 0..2
  }

  test("vacuum retains the history a lagging consumer needs; dropping the consumer releases it") {
    val root = tmpDir("retention")
    SnapshotStore.init(spark, root,
      (1L to 20L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = 2)
    ChangeFeed.seedConsumer(spark, root, "lagger", 0L)
    val v1 = SnapshotStore.commitDelta(spark, root,
      Seq((1L, "v1b", 2L)).toDF("k", "v", "ts"), Seq("k"), merge)
    val v2 = SnapshotStore.commitDelta(spark, root,
      Seq((2L, "v2b", 3L)).toDF("k", "v", "ts"), Seq("k"), merge)
    assert(Seq(v1, v2) == Seq(1L, 2L))

    SnapshotStore.vacuum(spark, root, keepLast = 1)
    // manifests 0..2 must all survive (consumer offset 0 needs base 0)
    assert(SnapshotStore.versions(spark, root) == Seq(0L, 1L, 2L))
    assert(changes(root, 0L, 2L).map(_._4) ==
      Set(ChangeFeed.UpdatePre, ChangeFeed.UpdatePost))

    ChangeFeed.dropConsumer(spark, root, "lagger")
    SnapshotStore.vacuum(spark, root, keepLast = 1)
    // v3 = the floor-advance's empty serialization commit
    assert(SnapshotStore.versions(spark, root) == Seq(2L, 3L))
    // now the feed is genuinely stale below the retained floor
    val ex = intercept[IllegalStateException](changes(root, 0L, 2L))
    assert(ex.getMessage.contains("STALE"))
  }

  test("syncDerived: derived table tracks the source through upserts, collapsed multi-version runs, and deletes; redelivery is a no-op") {
    val src = tmpDir("sync-src")
    val dst = tmpDir("sync-dst")
    SnapshotStore.init(spark, src,
      (1L to 40L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = 4)
    val mask = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("k"), upper(col("v")).as("v_clean"))
    def expect(): Set[(Long, String)] =
      mask(SnapshotStore.read(spark, src)).as[(Long, String)].collect().toSet
    def got(): Set[(Long, String)] =
      SnapshotStore.read(spark, dst).select("k", "v_clean")
        .as[(Long, String)].collect().toSet

    // bootstrap
    assert(ChangeFeed.syncDerived(spark, src, dst, "clean", Seq("k"),
      numBuckets = 2, transform = mask).contains((-1L, 0L)))
    assert(got() == expect())
    // in sync → no-op
    assert(ChangeFeed.syncDerived(spark, src, dst, "clean", Seq("k"),
      transform = mask).isEmpty)

    // three source versions before one sync: k=1 updated twice (only
    // the final state lands), k=41 inserted, k=2 deleted
    SnapshotStore.commitDelta(spark, src,
      Seq((1L, "x1", 2L)).toDF("k", "v", "ts"), Seq("k"), merge)
    SnapshotStore.commitDelta(spark, src,
      Seq((1L, "y1", 3L), (41L, "v41", 3L)).toDF("k", "v", "ts"), Seq("k"), merge)
    SnapshotStore.commitDeletes(spark, src, Seq(Tuple1(2L)).toDF("k"), Seq("k"))
    val dstBefore = SnapshotStore.latestVersion(spark, dst).get
    assert(ChangeFeed.syncDerived(spark, src, dst, "clean", Seq("k"),
      transform = mask).contains((0L, 3L)))
    assert(got() == expect())
    assert(got().contains((1L, "Y1")) && !got().exists(_._1 == 2L))
    // collapsed: one upsert commit + one delete commit, not one per version
    assert(SnapshotStore.latestVersion(spark, dst).get == dstBefore + 2)

    // delete then re-insert across versions lands as the re-insert
    SnapshotStore.commitDeletes(spark, src, Seq(Tuple1(3L)).toDF("k"), Seq("k"))
    SnapshotStore.commitDelta(spark, src,
      Seq((3L, "z3", 9L)).toDF("k", "v", "ts"), Seq("k"), merge)
    ChangeFeed.syncDerived(spark, src, dst, "clean", Seq("k"), transform = mask)
    assert(got() == expect() && got().contains((3L, "Z3")))

    // redelivery: re-running the SAME range (offset wound back, as a
    // crash before the advance would leave it) must not double-apply
    ChangeFeed.dropConsumer(spark, src, "clean")
    ChangeFeed.seedConsumer(spark, src, "clean", 3L)
    val vBefore = SnapshotStore.latestVersion(spark, dst).get
    ChangeFeed.syncDerived(spark, src, dst, "clean", Seq("k"), transform = mask)
    assert(got() == expect())
    assert(SnapshotStore.latestVersion(spark, dst).get == vBefore) // txn no-ops
  }

  test("restore surfaces as row-level changes and syncDerived propagates it downstream") {
    val src = tmpDir("restore-feed")
    val dst = tmpDir("restore-sync")
    val v0 = (1L to 40L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, src, v0, Seq("k"), numBuckets = 4)
    // downstream target bootstraps from v0
    assert(ChangeFeed.syncDerived(spark, src, dst, "mirror", Seq("k"))
      .contains((-1L, 0L)))

    // a bad commit: update k=3, insert k=41
    SnapshotStore.commitDelta(spark, src,
      Seq((3L, "bad3", 99L), (41L, "bad41", 99L)).toDF("k", "v", "ts"),
      Seq("k"), merge)
    ChangeFeed.syncDerived(spark, src, dst, "mirror", Seq("k"))

    // undo it: the feed must emit the reversion as ordinary I/U/D —
    // update k=3 back, delete k=41 (RESTORE is a data change to
    // consumers, not an invisible pointer swap)
    val rv = SnapshotStore.restore(spark, src, 0L)
    assert(changes(src, rv - 1, rv) == Set(
      (3L, "bad3", 99L, ChangeFeed.UpdatePre, rv),
      (3L, "v3", 3L, ChangeFeed.UpdatePost, rv),
      (41L, "bad41", 99L, ChangeFeed.Delete, rv)))

    // ...and the derived mirror follows the rollback automatically
    ChangeFeed.syncDerived(spark, src, dst, "mirror", Seq("k"))
    val mirror = SnapshotStore.read(spark, dst)
      .select("k", "v", "ts").as[(Long, String, Long)].collect().toSet
    assert(mirror == v0.as[(Long, String, Long)].collect().toSet)
  }

  test("additive schema evolution: new column surfaces as update post-images, old rows null-fill") {
    val root = tmpDir("evolve")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 1L)).toDF("k", "v", "ts"), Seq("k"), numBuckets = 2)
    val delta = Seq((1L, "a", 2L, "x")).toDF("k", "v", "ts", "extra")
    SnapshotStore.commitDelta(spark, root, delta, Seq("k"),
      (cur, d) => Scd1.merge(
        cur.withColumn("extra", lit(null).cast("string")), d,
        Seq("k"), Seq(col("ts").desc)))
    val got = ChangeFeed.readChanges(spark, root, Seq("k"), 0L, 1L)
      .select("k", "v", "extra", ChangeFeed.ChangeType)
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)), r.getString(3)))
      .toSet
    assert(got == Set(
      (1L, "a", None, ChangeFeed.UpdatePre),
      (1L, "a", Some("x"), ChangeFeed.UpdatePost)))
  }

  test("map-typed columns diff via canonical entry order; map-typed keys are rejected") {
    val root = tmpDir("map")
    // a map column AND an array-of-maps column — <=> supports neither
    val v0 = Seq(
      (1L, Map("a" -> 1L, "b" -> 2L), Seq(Map("z" -> 1L))),
      (2L, Map("x" -> 9L), Seq.empty[Map[String, Long]]),
      (3L, Map.empty[String, Long], Seq(Map("q" -> 7L)))).toDF("k", "m", "ams")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = 2)
    // k=1 genuinely changes; k=2 rewrites with an EQUAL map (different
    // literal entry order); k=3 untouched but likely co-bucketed
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, Map("b" -> 2L, "a" -> 99L), Seq(Map("z" -> 1L))),
        (2L, Map("x" -> 9L), Seq.empty[Map[String, Long]])).toDF("k", "m", "ams"),
      Seq("k"), SnapshotStore.upsertMerge(Seq("k")))
    val got = ChangeFeed.readChanges(spark, root, Seq("k"), 0L, 1L)
      .select(col("k"), col(ChangeFeed.ChangeType))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, ChangeFeed.UpdatePre), (1L, ChangeFeed.UpdatePost)))

    // naming a map column as the feed IDENTITY is rejected up front
    // (it cannot equi-join; SnapshotStore itself can't even bucket one)
    val e = intercept[IllegalArgumentException](
      ChangeFeed.readChanges(spark, root, Seq("m"), -1L, 0L).collect())
    assert(e.getMessage.contains("map-typed keys"))
  }

  test("long-range catch-up chunks the plan: bounded leaves, identical changes") {
    val root = tmpDir("chunk")
    SnapshotStore.init(spark, root,
      (1L to 30L).map(k => (k, s"v$k", 0L)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = 4)
    (1L to 21L).foreach { i =>
      SnapshotStore.commitDelta(spark, root,
        Seq((i, s"u$i", i)).toDF("k", "v", "ts"), Seq("k"), merge)
    }
    val single = ChangeFeed.readChanges(spark, root, Seq("k"), -1L, 21L,
      maxPlanSteps = 1000)
    val chunked = ChangeFeed.readChanges(spark, root, Seq("k"), -1L, 21L,
      maxPlanSteps = 4)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "ts", ChangeFeed.ChangeType, ChangeFeed.CommitVersion)
        .as[(Long, String, Long, String, Long)].collect().toSet
    assert(asSet(chunked) == asSet(single))
    assert(asSet(chunked).size == 30 + 21 * 2) // init inserts + per-step pre+post
    // 22 steps at 4/chunk = 6 checkpointed leaves — not 22 join sub-plans
    val leaves = chunked.queryExecution.logical.collectLeaves().size
    assert(leaves <= 6, s"expected ≤6 chunk leaves, got $leaves")
    assert(single.queryExecution.logical.collectLeaves().size > 22)
  }
}
