package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan

import graft.SparkSpec

/** Pushed (partial) LIMIT on the graft scan: a bare `LIMIT n` plans a
  * minimal prefix of buckets when the manifest proves their row
  * counts, and every split's reader stops after n rows regardless.
  * Spark keeps its own Limit above (the push is declared partial), so
  * results are exact in every case — the push is pure I/O savings.
  */
class LimitPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def planNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        planNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(planNodes)
  }

  private def scanOf(p: SparkPlan): SparkPlan =
    planNodes(p).find(_.getClass.getSimpleName == "BatchScanExec").get

  test("bare LIMIT reads a bucket prefix, not the table") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val root = Files.createTempDirectory("graft-limit").toString + "/t"
      (1L to 4000L).map(k => (k, s"v$k")).toDF("k", "v")
        .write.format("graft").option("keys", "k").option("numBuckets", "8")
        .save(root)

      val limited = spark.read.format("graft").load(root).limit(7)
      assert(limited.collect().length == 7)
      val scan = scanOf(limited.queryExecution.executedPlan)
      assert(scan.toString.contains("limit=7"),
        s"limit not pushed into the scan: $scan")
      // 8 buckets × ~500 rows: one bucket covers 7, and the reader cap
      // stops each split at 7 — far below a full-table read
      val scanRows = scan.metrics("numOutputRows").value
      assert(scanRows < 600, s"scan read $scanRows rows for LIMIT 7")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("LIMIT over a tombstoned table stays exact (no bucket trim)") {
    val root = Files.createTempDirectory("graft-limit-ts").toString + "/t"
    (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v")
      .write.format("graft").option("keys", "k").option("numBuckets", "4")
      .save(root)
    graft.store.SnapshotStore.commitDeletes(spark, root,
      (1L to 150L).toDF("k"), Seq("k"))
    val got = spark.read.format("graft").load(root).limit(60)
      .collect().map(_.getLong(0)).toSet
    // only 50 live rows remain; a trimmed read that trusted stale
    // bucket counts would under-deliver or resurrect deleted keys
    assert(got.size == 50 && got.forall(_ > 150L))
  }

  test("filtered LIMIT is exact (limit not pushed past the filter)") {
    val root = Files.createTempDirectory("graft-limit-f").toString + "/t"
    (1L to 1000L).map(k => (k, k % 10)).toDF("k", "m")
      .write.format("graft").option("keys", "k").option("numBuckets", "4")
      .save(root)
    val got = spark.read.format("graft").load(root)
      .where($"m" === 3).limit(5).collect()
    assert(got.length == 5 && got.forall(_.getLong(1) == 3L))
  }
}
