package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime (join-derived) filtering on the regular graft scan — the
  * dynamic-partition-pruning analog: joining a graft table against a
  * small filtered dimension on the MERGE KEY feeds the dimension's key
  * values back into the scan, which hashes them straight to their
  * buckets and reads only those. The join re-applies its own
  * condition, so the narrowing is pure I/O savings.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def planNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        planNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(planNodes)
  }

  test("join-key values prune buckets at runtime (DPP analog)") {
    // plain (non-adaptive) plan: metrics assertions below read the
    // scan node directly; DPP itself is a planning-time rule and
    // fires either way
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try runDppCase()
    finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  private def runDppCase(): Unit = {
    val root = Files.createTempDirectory("graft-dpp").toString + "/t"
    val total = 2000L
    (1L to total).map(k => (k, s"v$k")).toDF("k", "v")
      .write.format("graft").option("keys", "k").option("numBuckets", "8")
      .save(root)

    val fact = spark.read.format("graft").load(root)
    // selective filter on the dim side makes it a pruning candidate
    // (a real Filter node — a pre-folded local relation never
    // qualifies for dynamic pruning)
    val dim = spark.range(1L, 501L).toDF("dk").where(col("dk") % 100 === 0)

    val joined = fact.join(broadcast(dim), fact("k") === dim("dk"))
    // collect() executes THIS DataFrame's plan — the metrics below
    // must come from the same execution
    assert(joined.collect().length == 5)

    val plan = joined.queryExecution.executedPlan
    assert(planNodes(plan).map(_.toString).mkString.toLowerCase
      .contains("dynamicpruning"),
      "expected a dynamic-pruning subquery on the graft scan")
    // the scan must have emitted a strict subset of the table: only
    // the buckets the five keys hash into were read
    val scanRows = planNodes(plan)
      .filter(_.getClass.getSimpleName == "BatchScanExec")
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
    assert(scanRows.nonEmpty)
    assert(scanRows.min < total, s"scan read the whole table ($scanRows)")
    // and the narrowing is exactly bucket-level: the kept rows are the
    // union of the probed keys' buckets
    val m = graft.store.SnapshotStore.readManifest(spark, root,
      graft.store.SnapshotStore.latestVersion(spark, root).get)
    val keptBuckets = GraftFilters.bucketsOf(
      Seq(100L, 200L, 300L, 400L, 500L),
      org.apache.spark.sql.types.LongType, m.numBuckets)
    val expectRows = (1L to total).count(k =>
      keptBuckets(GraftFilters.bucketsOf(Seq(k),
        org.apache.spark.sql.types.LongType, m.numBuckets).head))
    assert(scanRows.min == expectRows)
  }

  test("composite-key join values narrow buckets via the capped tuple product") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try runCompositeCase()
    finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  private def runCompositeCase(): Unit = {
    val root = Files.createTempDirectory("graft-dpp-ck").toString + "/t"
    val total = 2000L
    (1L to total).map(k => (k, s"g${k % 4}", k * 7L)).toDF("k1", "k2", "v")
      .write.format("graft").option("keys", "k1,k2").option("numBuckets", "8")
      .save(root)
    val fact = spark.read.format("graft").load(root)
    // dim joins on BOTH key columns; selective filter makes it a DPP
    // candidate for each
    val dim = spark.range(1L, 501L).toDF("d1")
      .withColumn("d2", concat(lit("g"), (col("d1") % 4).cast("string")))
      .where(col("d1") % 250 === 0)
    val joined = fact.join(broadcast(dim),
      fact("k1") === dim("d1") && fact("k2") === dim("d2"))
    assert(joined.collect().length == 2) // (250,g2), (500,g0)

    val plan = joined.queryExecution.executedPlan
    val scanRows = planNodes(plan)
      .filter(_.getClass.getSimpleName == "BatchScanExec")
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
    assert(scanRows.nonEmpty)
    assert(scanRows.min < total, s"scan read the whole table ($scanRows)")
    // exact: the kept buckets are those of the per-column value
    // CROSS-PRODUCT (a superset of the joined tuples — conservative)
    val m = graft.store.SnapshotStore.readManifest(spark, root,
      graft.store.SnapshotStore.latestVersion(spark, root).get)
    import org.apache.spark.sql.types.{LongType, StringType}
    val kept = GraftFilters.bucketsOfTuples(Seq(
      (Seq(250L, 500L), LongType),
      (Seq("g2", "g0"), StringType)), m.numBuckets).get
    val expectRows = (1L to total).count { k =>
      val b = GraftFilters.bucketsOfTuples(Seq(
        (Seq(k), LongType), (Seq(s"g${k % 4}"), StringType)),
        m.numBuckets).get.head
      kept(b)
    }
    // bucket narrowing is an UPPER bound here: the same runtime In
    // filters also reach the parquet readers, whose dictionary /
    // row-group skipping drops non-matching row groups inside kept
    // buckets — the scan may legitimately emit fewer rows
    assert(scanRows.min > 0 && scanRows.min <= expectRows,
      s"expected at most bucket-level $expectRows rows, scan read ${scanRows.min}")
    // and the bucket-level narrowing itself is visible in the plan:
    // the scan kept exactly the tuple-product buckets
    val scanDesc = planNodes(plan)
      .filter(_.getClass.getSimpleName == "BatchScanExec")
      .map(_.toString).mkString
    val bucketsRead = "buckets=(\\d+)".r.findFirstMatchIn(scanDesc)
      .map(_.group(1).toInt)
    assert(bucketsRead.contains(kept.size),
      s"expected ${kept.size} buckets read, plan says $bucketsRead")
  }

  test("runtime stats-column values fold to range pruning") {
    val root = Files.createTempDirectory("graft-dpp2").toString + "/t"
    (1L to 2000L).map(k => (k, k * 3L)).toDF("k", "ts")
      .write.format("graft").option("keys", "k").option("numBuckets", "8")
      .option("statsCols", "ts").save(root)
    // values folded to [min,max] via the In-list: correctness of the
    // fold (superset semantics) — the fact side returns exact rows
    val fact = spark.read.format("graft").load(root)
    val dim = (1L to 2000L).toDF("dts").where(col("dts").isin(30L, 60L, 90L))
    val joined = fact.join(broadcast(dim), fact("ts") === dim("dts"))
    assert(joined.count() == 3)
  }
}
