package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.SnapshotStore

/** Reported statistics (auto-broadcast without hints) and manifest
  * aggregate pushdown (COUNT/MIN/MAX with zero file reads — and
  * correct refusal whenever the manifest answer would be inexact).
  */
class StatsPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-sp-$tag").toString

  private def table(tag: String, n: Long, buckets: Int = 4): String = {
    val root = tmpDir(tag)
    SnapshotStore.init(spark, root,
      (1L to n).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"),
      Seq("k"), numBuckets = buckets, statsCols = Seq("ts"))
    root
  }

  private def hasLocalScan(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collectLeaves()
      .exists(_.isInstanceOf[LocalTableScanExec])
  private def hasBatchScan(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collectLeaves()
      .exists(_.isInstanceOf[BatchScanExec])

  test("reported statistics: a small graft dim auto-broadcasts with no hint") {
    val root = table("bcast", n = 500L)
    // AQE off: assert the STATIC planner broadcasts from the scan's
    // reported statistics alone (AQE would eventually rescue at
    // runtime — the point of SupportsReportStatistics is not needing
    // the rescue)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dim = spark.read.format("graft").load(root)
      // the fact side is big enough that ITS stats exceed the
      // broadcast threshold — only the graft side's REPORTED size
      // qualifies
      val fact = spark.range(1L, 5000000L).toDF("k")
        .withColumn("payload", col("k") * 2)
      val joined = fact.join(dim, "k")
      val bhj = joined.queryExecution.executedPlan.collect {
        case j: BroadcastHashJoinExec => j
      }
      assert(bhj.nonEmpty,
        s"expected unhinted BroadcastHashJoin, got\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 500L)

      // sanity: the DSv2 relation carries the post-pruning size, not
      // the session default (which would be ~8 EiB and never broadcast)
      val stats = joined.queryExecution.optimizedPlan.collectLeaves()
        .map(_.stats.sizeInBytes)
      assert(stats.exists(_ < 10L * 1024 * 1024))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("COUNT(*)/MIN/MAX answer from the manifest with zero file reads") {
    val root = table("agg", n = 1000L)
    val df = spark.read.format("graft").load(root)

    val q = df.agg(count(lit(1)).as("n"), min("ts").as("mn"), max("ts").as("mx"))
    assert(hasLocalScan(q) && !hasBatchScan(q),
      s"expected a manifest-answered local scan:\n${q.queryExecution.executedPlan}")
    assert(q.as[(Long, Long, Long)].head() == ((1000L, 1L, 1000L)))

    // upserts keep it exact (rows/stats refresh with each commit)
    SnapshotStore.commitDelta(spark, root,
      Seq((2000L, "new", 5000L)).toDF("k", "v", "ts"), Seq("k"),
      SnapshotStore.upsertMerge(Seq("k")))
    val q2 = spark.read.format("graft").load(root)
      .agg(count(lit(1)), max("ts"))
    assert(hasLocalScan(q2))
    assert(q2.as[(Long, Long)].head() == ((1001L, 5000L)))

    // SQL through a view takes the same path
    spark.read.format("graft").load(root).createOrReplaceTempView("sp_agg_v")
    val q3 = spark.sql("SELECT count(*) FROM sp_agg_v")
    assert(hasLocalScan(q3))
    assert(q3.as[Long].head() == 1001L)
  }

  test("pushdown refuses whenever the manifest answer would be inexact") {
    val root = table("refuse", n = 100L)
    // outstanding tombstones: counts and extremes may be stale
    SnapshotStore.commitDeletes(spark, root, Seq(100L).toDF("k"), Seq("k"))
    val df = spark.read.format("graft").load(root)
    val q = df.agg(count(lit(1)).as("n"), max("ts").as("mx"))
    assert(!hasLocalScan(q), "tombstoned table must scan, not trust the manifest")
    assert(q.as[(Long, Long)].head() == ((99L, 99L)))

    // folding the deletes restores exactness
    SnapshotStore.compact(spark, root, minFiles = 2)
    val q2 = spark.read.format("graft").load(root).agg(count(lit(1)), max("ts"))
    assert(hasLocalScan(q2))
    assert(q2.as[(Long, Long)].head() == ((99L, 99L)))

    // a filtered aggregate must never be manifest-answered
    val q3 = df.where(col("ts") <= 50L).agg(count(lit(1)))
    assert(!hasLocalScan(q3))
    assert(q3.as[Long].head() == 50L)

    // min/max on a non-stats column can't answer; count(*) alone in the
    // same aggregation must also fall back (all-or-nothing)
    val q4 = spark.read.format("graft").load(root).agg(count(lit(1)), max("k"))
    assert(!hasLocalScan(q4))
    assert(q4.as[(Long, Long)].head() == ((99L, 99L)))
  }

  test("time travel: the pushed aggregate answers from the pinned version's manifest") {
    val root = table("tt", n = 10L)
    SnapshotStore.commitDelta(spark, root,
      (11L to 20L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"), Seq("k"),
      SnapshotStore.upsertMerge(Seq("k")))
    val q = spark.read.format("graft").option("versionAsOf", "0").load(root)
      .agg(count(lit(1)), max("ts"))
    assert(hasLocalScan(q))
    assert(q.as[(Long, Long)].head() == ((10L, 10L)))
    val qNow = spark.read.format("graft").load(root).agg(count(lit(1)), max("ts"))
    assert(qNow.as[(Long, Long)].head() == ((20L, 20L)))
  }
}
