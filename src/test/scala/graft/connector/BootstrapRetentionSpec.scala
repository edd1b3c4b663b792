package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.store.{ChangeFeed, SnapshotStore}

/** The vacuumed-bootstrap contract (found by StreamChaosBlast at
  * 3-mutator intensity): `startingVersion=-1` on a table whose early
  * history was legally vacuumed BEFORE the consumer registered must
  * not wedge the query on the STALE error forever (`from` stays -1
  * until a batch commits, so every restart recomputes the same
  * impossible replay). The bootstrap batch instead degrades to the net
  * state at the range end as inserts — merge-equivalent for any fresh
  * mirror — and the stream proceeds incrementally under the
  * now-registered consumer's retention floor. A NUMERIC
  * startingVersion below retention stays the loud STALE error: the
  * user named specific history that is gone.
  */
class BootstrapRetentionSpec extends SparkSpec {
  import spark.implicits._

  test("startingVersion=-1 after pre-registration vacuum: net-state bootstrap, then incremental") {
    val root = Files.createTempDirectory("graft-bootstrap").toString + "/t"
    SnapshotStore.init(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root, Seq((1L, "a2")).toDF("k", "v"),
      Seq("k"), SnapshotStore.upsertMerge(Seq("k")))
    SnapshotStore.commitDelta(spark, root, Seq((3L, "c")).toDF("k", "v"),
      Seq("k"), SnapshotStore.upsertMerge(Seq("k")))
    // checkpoint so the retention floor's manifest is reconstructable,
    // then vacuum with NO consumer registered: v0/v1 legally reclaimed
    SnapshotStore.checkpoint(spark, root): Unit
    SnapshotStore.vacuum(spark, root): Unit
    assert(SnapshotStore.versions(spark, root).head > 0, "vacuum kept v0 — precondition")

    val ckpt = Files.createTempDirectory("graft-bootstrap-ckpt").toString
    val mirror = scala.collection.mutable.Map.empty[Long, String]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, String)]]
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("path", root).option("keys", "k")
        .option("startingVersion", "-1")
        .option("consumerId", "boot")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          val rows = b.select(col("k"), col("v"), col(ChangeFeed.ChangeType))
            .as[(Long, String, String)].collect().toSeq
          mirror.synchronized {
            rows.foreach {
              case (k, _, ChangeFeed.Delete) => mirror.remove(k): Unit
              case (k, v, t) if t == ChangeFeed.Insert || t == ChangeFeed.UpdatePost =>
                mirror(k) = v
              case _ => ()
            }
            if (rows.nonEmpty) batches += rows
          }: Unit
        }
        .start()
      assert(q.awaitTermination(120000), "AvailableNow did not stop")
    }

    drain()
    assert(mirror.toMap == Map(1L -> "a2", 2L -> "b", 3L -> "c"),
      s"bootstrap must deliver the net state: ${mirror.toMap}")
    // the degraded bootstrap is inserts-only (nothing to retract)
    assert(batches.head.forall(_._3 == ChangeFeed.Insert),
      s"bootstrap rows must be inserts: ${batches.head}")

    // incremental resume: an ordinary diff, not another refresh
    spark.sql(s"SELECT 1").collect() // no-op spacer
    SnapshotStore.commitDelta(spark, root, Seq((2L, "b2")).toDF("k", "v"),
      Seq("k"), SnapshotStore.upsertMerge(Seq("k")))
    drain()
    assert(mirror.toMap == Map(1L -> "a2", 2L -> "b2", 3L -> "c"))
    assert(batches.last.size == 2, // pre+post update images
      s"resume must be an ordinary diff: ${batches.last}")
  }

  test("a NUMERIC startingVersion below retention stays the loud STALE error") {
    val root = Files.createTempDirectory("graft-bootstrap2").toString + "/t"
    SnapshotStore.init(spark, root,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root, Seq((2L, "b")).toDF("k", "v"),
      Seq("k"), SnapshotStore.upsertMerge(Seq("k")))
    SnapshotStore.commitDelta(spark, root, Seq((3L, "c")).toDF("k", "v"),
      Seq("k"), SnapshotStore.upsertMerge(Seq("k")))
    SnapshotStore.checkpoint(spark, root): Unit
    SnapshotStore.vacuum(spark, root): Unit
    val ckpt = Files.createTempDirectory("graft-bootstrap2-ckpt").toString
    val q = spark.readStream.format("graft")
      .option("path", root).option("keys", "k")
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: Dataset[Row], _: Long) => () }
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000): Unit
    }
    assert(e.toString.contains("STALE") ||
      (e.getCause != null && e.getCause.toString.contains("STALE")),
      s"expected the loud STALE refusal: $e")
  }
}
