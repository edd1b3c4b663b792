package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MERGE builder semantics: clause order, conditions over
  * source./target., mixed I/U/D in one commit, ANSI duplicate-match
  * rejection, txn redelivery, and key resolution from the manifest.
  */
class GraftMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-mg-$tag").toString + "/t"

  private def state(root: String): Set[(Long, String, Long)] =
    SnapshotStore.read(spark, root).select("k", "v", "ts")
      .as[(Long, String, Long)].collect().toSet

  test("mixed insert/update/delete in one merge commit; unmatched target rows untouched") {
    val root = tmpDir("iud")
    SnapshotStore.init(spark, root,
      (1L to 20L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = 4)

    // op column exists only on the source — conditions see it, the
    // written rows don't
    val source = Seq(
      (1L, "updated", 100L, "U"),
      (2L, "ignored", 100L, "D"),
      (21L, "inserted", 100L, "I"),
      (22L, "not-inserted", 100L, "D") // unmatched + op D: no insert clause match? inserted below
    ).toDF("k", "v", "ts", "op")

    val v = GraftMerge.into(spark, root)
      .using(source)
      .whenMatchedDelete(expr("source.op = 'D'"))
      .whenMatchedUpdate(expr("source.op = 'U'"))
      .whenNotMatchedInsert(expr("source.op <> 'D'"))
      .execute()
    assert(v == 1L)

    val now = state(root)
    assert(now((1L, "updated", 100L)), "matched U row replaces")
    assert(!now.exists(_._1 == 2L), "matched D row deletes")
    assert(now((21L, "inserted", 100L)), "unmatched insert applies")
    assert(!now.exists(_._1 == 22L), "conditional insert filters")
    assert(now.size == 20, "19 untouched + 1 update + 1 insert")
    (3L to 20L).foreach(k => assert(now((k, s"v$k", k)), s"row $k untouched"))
    // history intact
    assert(SnapshotStore.readVersion(spark, root, 0L).count() == 20L)
  }

  test("clause order wins: first applicable matched clause applies") {
    val root = tmpDir("order")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = 1)
    // delete-before-update: the unconditional update never sees k=1
    GraftMerge.into(spark, root)
      .using(Seq((1L, "x", 9L), (2L, "y", 9L)).toDF("k", "v", "ts"))
      .whenMatchedDelete(expr("source.k = 1"))
      .whenMatchedUpdate()
      .execute()
    assert(state(root) == Set((2L, "y", 9L)))
  }

  test("conditions compare source to target") {
    val root = tmpDir("cond")
    SnapshotStore.init(spark, root,
      Seq((1L, "new", 10L), (2L, "old", 1L)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = 1)
    // late-arriving merge: only update when the source is newer
    GraftMerge.into(spark, root)
      .using(Seq((1L, "stale", 5L), (2L, "fresh", 5L)).toDF("k", "v", "ts"))
      .whenMatchedUpdate(expr("source.ts > target.ts"))
      .execute()
    assert(state(root) == Set((1L, "new", 10L), (2L, "fresh", 5L)))
  }

  test("ANSI duplicate-match rejection, key resolution, missing-column and txn guards") {
    val root = tmpDir("guards")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 1L)).toDF("k", "v", "ts"), Seq("k"), numBuckets = 1)

    val dup = intercept[IllegalArgumentException] {
      GraftMerge.into(spark, root)
        .using(Seq((1L, "x", 1L), (1L, "y", 2L)).toDF("k", "v", "ts"))
        .whenMatchedUpdate().execute()
    }
    assert(dup.getMessage.contains("multiple rows"))

    val wrongKeys = intercept[IllegalArgumentException] {
      GraftMerge.into(spark, root)
        .using(Seq((2L, "x", 1L)).toDF("k", "v", "ts"))
        .onKeys("v").whenMatchedUpdate().execute()
    }
    assert(wrongKeys.getMessage.contains("persisted identity"))

    val missingCol = intercept[IllegalArgumentException] {
      GraftMerge.into(spark, root)
        .using(Seq((2L, "x")).toDF("k", "v"))
        .whenMatchedUpdate().execute()
    }
    assert(missingCol.getMessage.contains("ts"))

    // txn: a redelivered batch is a no-op
    GraftMerge.into(spark, root)
      .using(Seq((2L, "b", 2L)).toDF("k", "v", "ts"))
      .whenNotMatchedInsert().withTxn("merge-writer", 7L).execute()
    val vAfter = SnapshotStore.latestVersion(spark, root).get
    GraftMerge.into(spark, root)
      .using(Seq((3L, "c", 3L)).toDF("k", "v", "ts"))
      .whenNotMatchedInsert().withTxn("merge-writer", 7L).execute()
    assert(SnapshotStore.latestVersion(spark, root).get == vAfter)
    assert(state(root) == Set((1L, "a", 1L), (2L, "b", 2L)))
  }

  test("merge into an all-new bucket region (empty current) inserts cleanly") {
    val root = tmpDir("newbuckets")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 1L)).toDF("k", "v", "ts"), Seq("k"), numBuckets = 8)
    // keys chosen to scatter across (mostly empty) buckets
    GraftMerge.into(spark, root)
      .using((100L to 120L).map(k => (k, s"n$k", k, "I")).toDF("k", "v", "ts", "op"))
      .whenMatchedUpdate(expr("source.op = 'U'"))
      .whenNotMatchedInsert()
      .execute()
    assert(SnapshotStore.read(spark, root).count() == 22L)
  }
}
