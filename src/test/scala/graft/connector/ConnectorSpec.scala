package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scd1
import graft.store.{ChangeFeed, SnapshotStore}

/** The DSv2 connector must be indistinguishable from the library read
  * path: same rows, same schema, same tombstone/time-travel semantics
  * — while planning fewer files under pushed range predicates.
  */
class ConnectorSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-conn-$tag").toString

  private val merge = (cur: DataFrame, delta: DataFrame) =>
    Scd1.merge(cur, delta, Seq("k"), Seq(col("ts").desc))

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select("k", "v", "ts").as[(Long, String, Long)].collect().toSet

  private def scanPartitions(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case b: BatchScanExec => b.inputRDD.getNumPartitions
    }.sum

  private def freshTable(tag: String, n: Long = 400L, buckets: Int = 8): String = {
    val root = tmpDir(tag)
    val v0 = (1L to n).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, root, v0, Seq("k"), numBuckets = buckets,
      statsCols = Seq("ts"))
    root
  }

  test("format(graft) ≡ SnapshotStore.read: rows, schema, tombstones, time travel") {
    val root = freshTable("basic", n = 120L, buckets = 4)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "v1b", 200L), (121L, "v121", 200L)).toDF("k", "v", "ts"),
      Seq("k"), merge)
    SnapshotStore.commitDeletes(spark, root, Seq(7L, 8L).toDF("k"), Seq("k"))

    val conn = spark.read.format("graft").load(root)
    val lib = SnapshotStore.read(spark, root)
    assert(conn.schema == lib.schema)
    assert(rows(conn) == rows(lib))
    assert(!rows(conn).exists(r => r._1 == 7L || r._1 == 8L)) // MoR applied in-scan

    // tombstone subtraction holds even when the key column is pruned
    // away by the projection (the scan reads it internally)
    assert(conn.select("v").as[String].collect().sorted.toSeq ==
      lib.select("v").as[String].collect().sorted.toSeq)

    // time travel
    val v0 = spark.read.format("graft").option("versionAsOf", 0).load(root)
    assert(rows(v0) == rows(SnapshotStore.readVersion(spark, root, 0L)))
    assert(rows(v0).exists(_._1 == 7L)) // pre-delete snapshot still has it
  }

  test("pushed range predicates prune buckets/files; result ≡ full scan + filter") {
    val root = freshTable("prune")
    val conn = spark.read.format("graft").load(root)
    val filtered = conn.where(col("ts") <= 2L)
    // ts == k, hash-bucketed: only the buckets holding k=1,2 can
    // overlap [ , 2] — strictly fewer splits than the full scan
    assert(scanPartitions(filtered) < scanPartitions(conn),
      s"expected pruning: ${scanPartitions(filtered)} vs ${scanPartitions(conn)}")
    assert(rows(filtered) == rows(conn).filter(_._3 <= 2L))
    // equality + both-sided ranges compose conjunctively
    val eq = conn.where(col("ts") === 5L and col("k") === 5L)
    assert(rows(eq) == Set((5L, "v5", 5L)))
    // an everything-pruned predicate still returns the right emptiness
    assert(conn.where(col("ts") > 100000L).isEmpty)
  }

  test("plain SQL over a graft table: CREATE TEMPORARY VIEW USING graft") {
    val root = freshTable("sql", n = 50L, buckets = 4)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_sql_t USING graft OPTIONS (path '$root')")
    val got = spark.sql(
      "SELECT count(*) AS n, cast(sum(ts) AS bigint) AS s FROM graft_sql_t WHERE ts <= 10")
      .as[(Long, Long)].head()
    assert(got == ((10L, 55L)))
  }

  test("streaming change feed ≡ batch readChanges; checkpoint resume delivers only new versions") {
    val root = freshTable("stream", n = 40L, buckets = 4)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "x", 100L)).toDF("k", "v", "ts"), Seq("k"), merge)
    SnapshotStore.commitDeletes(spark, root, Seq(2L).toDF("k"), Seq("k"))
    val ckpt = tmpDir("stream-ckpt")

    def asSet(df: DataFrame): Set[(Long, String, Long, String, Long)] =
      df.select("k", "v", "ts", ChangeFeed.ChangeType, ChangeFeed.CommitVersion)
        .as[(Long, String, Long, String, Long)].collect().toSet

    // foreachBatch (checkpoint-recoverable, unlike the memory sink)
    // collecting into a serialized buffer
    val received = scala.collection.mutable.Set.empty[(Long, String, Long, String, Long)]
    def runStream(): Unit = {
      val q = spark.readStream.format("graft")
        .option("path", root).option("keys", "k")
        .option("startingVersion", "-1")
        .option("consumerId", "conn-spec")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val batch = asSet(b.toDF())
          received.synchronized { received ++= batch }: Unit
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    runStream()
    val latest1 = SnapshotStore.latestVersion(spark, root).get
    assert(received.toSet ==
      asSet(ChangeFeed.readChanges(spark, root, Seq("k"), -1L, latest1)))

    // more commits, then resume from the same checkpoint: ONLY the new
    // versions arrive (offsets are table versions)
    SnapshotStore.commitDelta(spark, root,
      Seq((3L, "y", 300L)).toDF("k", "v", "ts"), Seq("k"), merge)
    val latest2 = SnapshotStore.latestVersion(spark, root).get
    received.clear()
    runStream()
    assert(received.toSet ==
      asSet(ChangeFeed.readChanges(spark, root, Seq("k"), latest1, latest2)))

    // the stream's named consumer is registered (vacuum retention)
    assert(ChangeFeed.consumerOffset(spark, root, "conn-spec").nonEmpty)
  }

  test("batch change-feed read: option(readChangeFeed) ≡ library readChanges, SQL-able") {
    val root = freshTable("cdf-batch", n = 30L, buckets = 4)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "x", 100L)).toDF("k", "v", "ts"), Seq("k"), merge)
    SnapshotStore.commitDeletes(spark, root, Seq(2L).toDF("k"), Seq("k"))
    def asSet(df: DataFrame) =
      df.select("k", "v", "ts", ChangeFeed.ChangeType, ChangeFeed.CommitVersion)
        .as[(Long, String, Long, String, Long)].collect().toSet

    val full = spark.read.format("graft")
      .option("readChangeFeed", "true").option("keys", "k")
      .load(root)
    assert(asSet(full) == asSet(ChangeFeed.readChanges(spark, root, Seq("k"), -1L, 2L)))

    val ranged = spark.read.format("graft")
      .option("readChangeFeed", "true").option("keys", "k")
      .option("startingVersion", "0").option("endingVersion", "1")
      .load(root)
    assert(asSet(ranged) == asSet(ChangeFeed.readChanges(spark, root, Seq("k"), 0L, 1L)))

    // plain SQL over the feed
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdf_v USING graft OPTIONS " +
      s"(path '$root', readChangeFeed 'true', keys 'k', startingVersion '0')")
    assert(spark.sql(
      s"SELECT count(*) FROM cdf_v WHERE ${ChangeFeed.ChangeType} = 'delete'")
      .as[Long].head() == 1L)
  }

  test("default startingVersion: restart delivers versions committed while the query was down") {
    val root = freshTable("restart", n = 20L, buckets = 4)
    val ckpt = tmpDir("restart-ckpt")
    val received = scala.collection.mutable.Set.empty[(Long, String)]
    def runStream(): Unit = {
      val q = spark.readStream.format("graft")
        .option("path", root).option("keys", "k") // NO startingVersion: default latest
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val batch = b.select(col("k"), col(ChangeFeed.ChangeType))
            .as[(Long, String)].collect().toSet
          received.synchronized { received ++= batch }: Unit
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    runStream() // created at the current latest: nothing to deliver
    assert(received.isEmpty)

    // versions land WHILE THE QUERY IS DOWN — the checkpoint (not a
    // re-resolved "latest") must govern the restart's starting point
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "x", 100L)).toDF("k", "v", "ts"), Seq("k"), merge)
    SnapshotStore.commitDeletes(spark, root, Seq(2L).toDF("k"), Seq("k"))
    runStream()
    assert(received.toSet == Set(
      (1L, ChangeFeed.UpdatePre), (1L, ChangeFeed.UpdatePost),
      (2L, ChangeFeed.Delete)))
  }

  test("maxVersionsPerBatch rate-limits: a commit burst drains in bounded batches, same rows") {
    val root = freshTable("rate", n = 20L, buckets = 4)
    (1L to 4L).foreach { i =>
      SnapshotStore.commitDelta(spark, root,
        Seq((i, s"u$i", 100L + i)).toDF("k", "v", "ts"), Seq("k"), merge)
    }
    val ckpt = tmpDir("rate-ckpt")
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    def runStream(): Unit = {
      val q = spark.readStream.format("graft")
        .option("path", root).option("keys", "k")
        .option("startingVersion", "0") // the 4-version burst is the backlog
        .option("maxVersionsPerBatch", "1")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val versions = b.select(col(ChangeFeed.CommitVersion)).as[Long].collect().toSet
          batchSizes.synchronized { batchSizes += versions }: Unit
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    runStream()
    val nonEmpty = batchSizes.filter(_.nonEmpty)
    // one version per non-empty batch — the burst never collapses into
    // one giant transaction
    assert(nonEmpty.size == 4 && nonEmpty.forall(_.size == 1),
      s"expected 4 single-version batches, got $batchSizes")
    assert(nonEmpty.flatten.toSet == Set(1L, 2L, 3L, 4L))

    // RESTART with the rate limit still on: the persisted offer base
    // keeps the cap from re-offering below the checkpoint — versions
    // 1-4 must NOT be re-delivered, the two new versions drain capped
    batchSizes.clear()
    (5L to 6L).foreach { i =>
      SnapshotStore.commitDelta(spark, root,
        Seq((i, s"u$i", 100L + i)).toDF("k", "v", "ts"), Seq("k"), merge)
    }
    runStream()
    val after = batchSizes.filter(_.nonEmpty)
    assert(after.flatten.toSet == Set(5L, 6L),
      s"restart must deliver only new versions, got $after")
    assert(after.forall(_.size == 1), s"cap must survive restart, got $after")
  }
}
