package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pruning observability: the graft scan reports its planning facts
  * (buckets read/pruned, files, planned bytes, tombstone debt) as
  * DSv2 driver metrics, so "did the filter prune?" is readable off
  * the executed plan / Spark UI instead of re-derived by explaining
  * the query.
  */
class ScanMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def planNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        planNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(planNodes)
  }

  private def scanMetric(plan: SparkPlan, name: String): Long =
    planNodes(plan).filter(_.getClass.getSimpleName == "BatchScanExec")
      .flatMap(_.metrics.get(name).map(_.value)).head

  test("a runtime-pruned scan reports buckets read vs pruned as driver metrics") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val root = Files.createTempDirectory("graft-sm").toString + "/t"
      (1L to 2000L).map(k => (k, s"v$k")).toDF("k", "v")
        .write.format("graft").option("keys", "k").option("numBuckets", "8")
        .save(root)
      val fact = spark.read.format("graft").load(root)
      val dim = spark.range(1L, 501L).toDF("dk").where(col("dk") % 100 === 0)
      val joined = fact.join(broadcast(dim), fact("k") === dim("dk"))
      assert(joined.collect().length == 5)
      val plan = joined.queryExecution.executedPlan
      val read = scanMetric(plan, "graftBucketsRead")
      val pruned = scanMetric(plan, "graftBucketsPruned")
      assert(read + pruned == 8, s"read=$read pruned=$pruned")
      assert(pruned > 0, "runtime filter should have pruned buckets")
      assert(scanMetric(plan, "graftFilesRead") >= read)
      assert(scanMetric(plan, "graftPlannedBytes") > 0)
      assert(scanMetric(plan, "graftTombstoneBuckets") == 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("tombstone debt surfaces on the scan metrics") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val root = Files.createTempDirectory("graft-smt").toString + "/t"
      (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
        .write.format("graft").option("keys", "k").option("numBuckets", "4")
        .save(root)
      graft.store.SnapshotStore.commitDeletes(spark, root,
        Seq(5L, 6L).toDF("k"), Seq("k"))
      val df = spark.read.format("graft").load(root)
      assert(df.collect().length == 98)
      assert(scanMetric(df.queryExecution.executedPlan,
        "graftTombstoneBuckets") > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }
}
