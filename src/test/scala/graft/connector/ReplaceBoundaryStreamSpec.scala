package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.store.{ChangeFeed, SnapshotStore}

/** Streaming change-feed recovery across a keys-changing REPLACE.
  *
  * The reference recreates streams together with their tables
  * (`/root/reference/02 Location Entity.sql:29,79`); a long-running
  * graft ingest should not need operator surgery when its source table
  * is REPLACEd. Default behavior stays the loud refusal (a keyed diff
  * across unrelated contents is meaningless); with
  * `option("replaceBoundary", "refresh")` the boundary batch delivers
  * the [[ChangeFeed.syncDerived]] recovery IN-BAND: retraction
  * `delete` rows for the whole pre-range state plus `insert` rows for
  * the whole end state — ordinary change rows any merge-applying
  * consumer converges under — then the query resumes incrementally.
  */
class ReplaceBoundaryStreamSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-rbs").toString
  locally {
    spark.conf.set("spark.sql.catalog.grbs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grbs.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grbs.ns")
  }

  /** Mirror maintained exactly the way a derived table would be: apply
    * the batch's deletes, then upsert its inserts/postimages, keyed by
    * the MIRROR's identity (k) — which both epochs of the source carry.
    */
  private def applyBatch(mirror: scala.collection.mutable.Map[Long, String],
                         rows: Seq[(Long, Option[String], String, Long)]): Unit = {
    val ordered = rows.sortBy(_._4) // commit-version order: retractions first
    ordered.foreach {
      case (k, _, ChangeFeed.Delete, _) => mirror.remove(k): Unit
      case (k, v, t, _) if t == ChangeFeed.Insert || t == ChangeFeed.UpdatePost =>
        mirror(k) = v.orNull
      case _ => () // update_preimage: informational
    }
  }

  test("replaceBoundary=refresh: one in-band full-refresh batch, then incremental resume") {
    spark.sql("""CREATE TABLE grbs.ns.src (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO grbs.ns.src SELECT id, concat('a', id) FROM range(6)")
    val root = s"$warehouse/ns/src"
    val ckpt = Files.createTempDirectory("graft-rbs-ckpt").toString

    val mirror = scala.collection.mutable.Map.empty[Long, String]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("path", root).option("keys", "k")
        .option("startingVersion", "-1")
        .option("consumerId", "rbs-mirror")
        .option("replaceBoundary", "refresh")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          val rows = b.select(col("k"),
            col("v"), col(ChangeFeed.ChangeType), col(ChangeFeed.CommitVersion))
            .as[(Long, Option[String], String, Long)].collect().toSeq
          mirror.synchronized {
            applyBatch(mirror, rows)
            batches += rows.size
          }: Unit
        }
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query did not stop")
    }

    drain()
    assert(mirror.toMap == (0L until 6L).map(k => k -> s"a$k").toMap)

    // the REPLACE changes keys (k -> id) but keeps a k column, so the
    // mirror's own identity stays valid — the syncDerived contract
    spark.sql("""REPLACE TABLE grbs.ns.src TBLPROPERTIES ('keys'='id') AS
                 SELECT id + 100 AS id, id AS k, concat('b', id) AS v
                 FROM range(3)""")
    // plus an ordinary post-replace commit in the same drained range:
    // the refresh collapses both (state at range end)
    spark.sql("INSERT INTO grbs.ns.src VALUES (109, 9, 'b9')")
    drain()
    // mirror == exactly the rebuilt state: stale keys 3..5 retracted
    assert(mirror.toMap ==
      Map(0L -> "b0", 1L -> "b1", 2L -> "b2", 9L -> "b9"),
      s"mirror after refresh: ${mirror.toMap}")
    // the refresh was ONE batch: 6 retractions + 4 inserts
    assert(batches.last == 10, s"batch sizes: $batches")

    // incremental resume AFTER the boundary: ordinary diff rows again
    spark.sql("INSERT INTO grbs.ns.src VALUES (102, 2, 'c2')")
    drain()
    assert(mirror.toMap ==
      Map(0L -> "b0", 1L -> "b1", 2L -> "c2", 9L -> "b9"))
    assert(batches.last == 2, s"expected pre+post update only: $batches")

    // restart with the same checkpoint: nothing redelivers
    val before = batches.size
    drain()
    assert(mirror.toMap ==
      Map(0L -> "b0", 1L -> "b1", 2L -> "c2", 9L -> "b9"))
    assert(batches.drop(before).forall(_ == 0),
      s"redelivery after restart: ${batches.drop(before)}")
  }

  test("an offset range spanning TWO replace boundaries delivers ONE combined refresh") {
    // A consumer that was down across two REPLACEs must not see two
    // stacked refreshes (retract, insert, retract, insert) — the
    // recovery is a function of the range ENDPOINTS only: one
    // retraction set at `from`, one insert set at `to`.
    spark.sql("""CREATE TABLE grbs.ns.two (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO grbs.ns.two SELECT id, concat('a', id) FROM range(4)")
    val root = s"$warehouse/ns/two"
    val ckpt = Files.createTempDirectory("graft-rbs-two").toString

    val mirror = scala.collection.mutable.Map.empty[Long, String]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("path", root).option("keys", "k")
        .option("startingVersion", "-1")
        .option("consumerId", "two-mirror")
        .option("replaceBoundary", "refresh")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          val rows = b.select(col("k"),
            col("v"), col(ChangeFeed.ChangeType), col(ChangeFeed.CommitVersion))
            .as[(Long, Option[String], String, Long)].collect().toSeq
          mirror.synchronized {
            applyBatch(mirror, rows)
            batches += rows.size
          }: Unit
        }
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query did not stop")
    }

    drain()
    assert(mirror.toMap == (0L until 4L).map(k => k -> s"a$k").toMap)

    // two keys-changing REPLACEs while the consumer is down — the
    // middle epoch must be invisible to the recovery
    spark.sql("""REPLACE TABLE grbs.ns.two TBLPROPERTIES ('keys'='id') AS
                 SELECT id + 100 AS id, id AS k, concat('mid', id) AS v
                 FROM range(9)""")
    spark.sql("""REPLACE TABLE grbs.ns.two TBLPROPERTIES ('keys'='g') AS
                 SELECT id + 200 AS g, id AS k, concat('b', id) AS v
                 FROM range(2)""")
    drain()
    assert(mirror.toMap == Map(0L -> "b0", 1L -> "b1"),
      s"mirror after double-replace refresh: ${mirror.toMap}")
    // ONE combined batch: 4 retractions + 2 inserts — never the middle
    // epoch's 9 rows
    assert(batches.last == 6, s"batch sizes: $batches")
  }

  test("batch CDF honors the same option: refresh batch instead of the refusal") {
    spark.sql("""CREATE TABLE grbs.ns.cdf (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO grbs.ns.cdf VALUES (1, 'a'), (2, 'b')")
    val root = s"$warehouse/ns/cdf"
    val vBefore = SnapshotStore.latestVersion(spark, root).get
    spark.sql("""REPLACE TABLE grbs.ns.cdf TBLPROPERTIES ('keys'='g') AS
                 SELECT 7 AS g, CAST(1 AS BIGINT) AS k, 'n' AS v""")

    def cdf(extra: (String, String)*) = {
      val r = spark.read.format("graft")
        .option("readChangeFeed", "true").option("keys", "k")
        .option("startingVersion", vBefore.toString)
      extra.foldLeft(r) { case (acc, (k2, v2)) => acc.option(k2, v2) }.load(root)
    }
    val refused = intercept[Exception] { cdf().collect() }
    assert(refused.getMessage.contains("REPLACE TABLE boundary"))

    val rows = cdf("replaceBoundary" -> "refresh")
      .select(col("k"), col("v"), col(ChangeFeed.ChangeType))
      .as[(Long, Option[String], String)].collect().toSet
    assert(rows == Set(
      (1L, Some("a"), ChangeFeed.Delete), (2L, Some("b"), ChangeFeed.Delete),
      (1L, Some("n"), ChangeFeed.Insert)), s"refresh rows: $rows")
  }

  test("default stays the loud refusal with the re-sync recipe") {
    spark.sql("""CREATE TABLE grbs.ns.ref (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO grbs.ns.ref VALUES (1, 'a')")
    val root = s"$warehouse/ns/ref"
    val ckpt = Files.createTempDirectory("graft-rbs-ckpt2").toString
    spark.sql("""REPLACE TABLE grbs.ns.ref TBLPROPERTIES ('keys'='g') AS
                 SELECT 1 AS g, 2 AS k""")
    val q = spark.readStream.format("graft")
      .option("path", root).option("keys", "k")
      .option("startingVersion", "-1")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: Dataset[Row], _: Long) => () }
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000): Unit
    }
    assert(e.toString.contains("REPLACE TABLE boundary") ||
      (e.getCause != null && e.getCause.toString.contains("REPLACE TABLE boundary")),
      s"unexpected failure: $e")
  }
}
