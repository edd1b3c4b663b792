package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Batch-style draining of the change feed: `Trigger.AvailableNow`
  * processes everything committed at query start — respecting the
  * source's `maxVersionsPerBatch` pacing — then STOPS on its own, the
  * scheduled-ingest shape (cron-run job, not an always-on cluster).
  * Spark wraps a V1 source with its available-now wrapper; this spec
  * pins that the graft source composes with it: terminates, delivers
  * exactly the pre-start changes, and a restart picks up later
  * commits without redelivery.
  */
class AvailableNowSpec extends SparkSpec {
  import spark.implicits._

  test("Trigger.AvailableNow drains the feed, stops, and resumes without redelivery") {
    val root = Files.createTempDirectory("graft-avnow").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-avnow-ckpt").toString
    (1L to 10L).map(k => (k, "a")).toDF("k", "v")
      .write.format("graft").option("keys", "k").option("numBuckets", "2").save(root)
    Seq((1L, "b")).toDF("k", "v")
      .write.format("graft").mode("append").save(root)

    val received = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("path", root).option("keys", "k")
        .option("startingVersion", "-1")
        .option("maxVersionsPerBatch", "1") // paced: multiple micro-batches
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = b.select(col("k"), col("v"),
            col(graft.store.ChangeFeed.ChangeType),
            col(graft.store.ChangeFeed.CommitVersion))
            .as[(Long, String, String, Long)].collect()
          received.synchronized { received ++= rows }: Unit
        }
        .start()
      // AvailableNow must terminate on its own — that IS the assertion
      assert(q.awaitTermination(120000), "AvailableNow query did not stop")
    }

    drain()
    val first = received.toVector
    // v0 inserts (10) + v1 pre/post images for k=1 (2)
    assert(first.size == 12, s"got ${first.size}: $first")
    assert(first.count(_._3 == "insert") == 10)
    assert(first.count(_._3.startsWith("update_")) == 2)

    // new commit AFTER the drain; a fresh AvailableNow run delivers
    // exactly the delta
    Seq((2L, "c")).toDF("k", "v")
      .write.format("graft").mode("append").save(root)
    received.clear()
    drain()
    val second = received.toVector
    assert(second.size == 2 && second.forall(_._1 == 2L),
      s"expected only k=2 pre/post, got $second")
  }
}
