package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Storage-partitioned joins: the bucket layout IS a reported
  * partitioning, so two graft tables joined on their merge key — or an
  * aggregation grouped by it — plan with ZERO shuffle on the graft
  * side(s). At 100 TB this is the difference between a fact⋈fact join
  * shuffling both tables and one shuffling nothing.
  */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-spj-wh").toString
  locally {
    spark.conf.set("spark.sql.catalog.spj",
      classOf[graft.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spj.ns")
  }

  private def planNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        planNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(planNodes)
  }

  private def shuffleCount(df: DataFrame): Int = {
    df.collect() // materialize so AQE (if on) settles the final plan
    planNodes(df.queryExecution.executedPlan)
      .count(_.getClass.getSimpleName.contains("ShuffleExchange"))
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("graft-to-graft join on the merge key plans with zero shuffles") {
    (1L to 200L).map(k => (k, s"a$k")).toDF("k", "va")
      .createOrReplaceTempView("spj_a_src")
    (1L to 150L).map(k => (k, k * 10L)).toDF("k", "vb")
      .createOrReplaceTempView("spj_b_src")
    spark.sql("""CREATE TABLE spj.ns.a USING graft
                 TBLPROPERTIES('keys'='k','numBuckets'='4')
                 AS SELECT * FROM spj_a_src""")
    spark.sql("""CREATE TABLE spj.ns.b USING graft
                 TBLPROPERTIES('keys'='k','numBuckets'='4')
                 AS SELECT * FROM spj_b_src""")
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.sql(
        "SELECT a.k, a.va, b.vb FROM spj.ns.a a JOIN spj.ns.b b ON a.k = b.k")
      assert(shuffleCount(joined) == 0,
        s"expected a storage-partitioned join:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 150)
      // and the result is right, not just shuffle-free
      val expect = (1L to 150L).map(k => (k, s"a$k", k * 10L)).toSet
      assert(joined.as[(Long, String, Long)].collect().toSet == expect)
    }
    // without the v2-bucketing opt-in the same query still answers
    // correctly through ordinary shuffles
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(spark.sql(
        "SELECT a.k FROM spj.ns.a a JOIN spj.ns.b b ON a.k = b.k").count() == 150)
    }
  }

  test("aggregation grouped by the merge key avoids the shuffle") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      val agg = spark.sql(
        "SELECT k, count(*) AS n FROM spj.ns.a GROUP BY k")
      assert(shuffleCount(agg) == 0,
        s"expected partition-aligned aggregation:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() == 200)
    }
  }

  test("skewed bucket fans out under partially-clustered SPJ, still zero-shuffle") {
    // one bucket dominated by fat payloads: without partial
    // clustering, a storage-partitioned join runs ONE task per bucket
    // and the skewed bucket serializes the stage at scale. With
    // `partiallyClusteredDistribution` the planner keeps the splits of
    // the bigger side ungrouped (replicating the other side's groups),
    // so the fat bucket spreads over its file splits — and the join
    // STAYS shuffle-free on both graft sides.
    val big = "x" * 2000
    (1L to 20000L).map(k => (k, if (k % 4 == 0) big else "s"))
      .toDF("k", "va").createOrReplaceTempView("spj_skew_a")
    (1L to 20000L).map(k => (k, k * 2L)).toDF("k", "vb")
      .createOrReplaceTempView("spj_skew_b")
    spark.sql("""CREATE TABLE spj.ns.ska USING graft
                 TBLPROPERTIES('keys'='k','numBuckets'='4')
                 AS SELECT * FROM spj_skew_a""")
    spark.sql("""CREATE TABLE spj.ns.skb USING graft
                 TBLPROPERTIES('keys'='k','numBuckets'='4')
                 AS SELECT * FROM spj_skew_b""")
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false",
      // force multiple splits per fat file so the fan-out is visible
      "spark.sql.files.maxPartitionBytes" -> "65536") {
      val joined = spark.sql(
        "SELECT a.k, a.va, b.vb FROM spj.ns.ska a JOIN spj.ns.skb b ON a.k = b.k")
      assert(joined.count() == 20000)
      assert(shuffleCount(joined) == 0,
        s"expected a zero-shuffle partially-clustered SPJ:\n${joined.queryExecution.executedPlan}")
      // the join's inputs fan out past one-task-per-bucket
      val scanParts = planNodes(joined.queryExecution.executedPlan)
        .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputRDD.getNumPartitions }
      assert(scanParts.nonEmpty && scanParts.forall(_ > 4),
        s"expected split-level fan-out beyond the 4 buckets, got $scanParts")
      // spot-check values, not just cardinality
      assert(joined.where(col("k") === 8L).as[(Long, String, Long)]
        .collect().toSet == Set((8L, big, 16L)))
    }
  }

  test("path-based reads (no catalog) degrade gracefully under v2 bucketing") {
    // a path read has no FunctionCatalog to resolve the reported
    // transform against — Spark must ignore the partitioning, not fail
    val root = Files.createTempDirectory("graft-spj-path").toString + "/t"
    (1L to 50L).map(k => (k, k * 2L)).toDF("k", "v")
      .write.format("graft").option("keys", "k").option("numBuckets", "4")
      .save(root)
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.read.format("graft").load(root)
      val b = spark.read.format("graft").load(root).withColumnRenamed("v", "v2")
      assert(a.join(b, "k").count() == 50)
      assert(a.groupBy("k").count().count() == 50)
    }
  }

  test("the bucket function is SQL-callable and matches the write layout") {
    val m = graft.store.SnapshotStore.readManifest(spark, s"$warehouse/ns/a",
      graft.store.SnapshotStore.latestVersion(spark, s"$warehouse/ns/a").get)
    val viaSql = spark.sql(
      "SELECT k, spj.bucket(4, k) AS b FROM spj.ns.a")
      .as[(Long, Int)].collect().toMap
    (1L to 200L).foreach { k =>
      val expect = GraftFilters.bucketsOf(Seq(k),
        org.apache.spark.sql.types.LongType, m.numBuckets).head
      assert(viaSql(k) == expect, s"k=$k")
    }
  }
}
