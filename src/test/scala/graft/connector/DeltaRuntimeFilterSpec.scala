package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.SnapshotStore

/** Runtime source-bucket filtering on DELTA-mode row-level rewrites
  * ([[DeltaDmlRuntimeFiltering]]): a selective MERGE against a
  * dml.mode=delta table must READ only the buckets its source keys
  * hash into — the scan-side counterpart of the delta commit's
  * O(changed-rows) write scope. Mirrors RuntimeFilterSpec's
  * bucket-exact assertions via the scan's numOutputRows metric.
  */
class DeltaRuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-drf-wh").toString
  locally {
    spark.conf.set("spark.sql.catalog.drf",
      classOf[graft.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.drf.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS drf.ns")
  }

  private def planNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        planNodes(a.executedPlan)
      case c: org.apache.spark.sql.execution.CommandResultExec =>
        // a DML statement's Dataset wraps the already-executed command
        // plan — the real tree (with its metrics) hangs off this field,
        // not off children
        planNodes(c.commandPhysicalPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(planNodes)
  }

  private def graftScanRows(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    planNodes(df.queryExecution.executedPlan)
      .filter(_.getClass.getSimpleName == "BatchScanExec")
      .filter(_.toString.contains("graft"))
      .flatMap(_.metrics.get("numOutputRows").map(_.value))

  private def withPlainPlans[A](body: => A): A = {
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  private var n = 0
  private def freshDeltaTable(count: Int, buckets: Int): (String, String) = {
    n += 1
    val t = s"t$n"
    (1 to count).map(k => (k.toLong, s"v$k", k * 10L))
      .toDF("k", "v", "cents").createOrReplaceTempView(s"drf_src_$n")
    spark.sql(
      s"""CREATE TABLE drf.ns.$t USING graft
         |TBLPROPERTIES ('keys'='k', 'numBuckets'='$buckets',
         |  'dml.mode'='delta')
         |AS SELECT * FROM drf_src_$n""".stripMargin)
    (s"drf.ns.$t", s"$warehouse/ns/$t")
  }

  test("selective delta MERGE scans only the source keys' buckets") {
    withPlainPlans {
      val total = 2000
      val (name, root) = freshDeltaTable(total, buckets = 8)
      Seq(400L, 800L, 1200L, 1600L, 2000L).toDF("sk")
        .createOrReplaceTempView("drf_merge_src")
      val res = spark.sql(
        s"""MERGE INTO $name t USING drf_merge_src s ON t.k = s.sk
           |WHEN MATCHED THEN UPDATE SET v = 'hit'
           |WHEN NOT MATCHED THEN INSERT (k, v, cents) VALUES (s.sk, 'new', 0)
           |""".stripMargin)
      // semantics first: 5 updates (400..2000 by 400), no inserts
      val got = spark.table(name).as[(Long, String, Long)].collect()
      assert(got.count(_._2 == "hit") == 5)
      assert(got.length == total)

      // the rewrite's target scan was runtime-narrowed to the buckets
      // the five source keys hash into — bucket-exact, like the DPP
      // analog on ordinary joins
      val planStr = planNodes(res.queryExecution.executedPlan)
        .map(_.toString).mkString.toLowerCase
      assert(planStr.contains("dynamicpruning"),
        "expected a dynamic-pruning subquery on the delta target scan")
      val m = SnapshotStore.readManifest(spark, root,
        SnapshotStore.latestVersion(spark, root).get)
      val srcKeys = Seq(400L, 800L, 1200L, 1600L, 2000L)
      val kept = GraftFilters.bucketsOf(srcKeys,
        org.apache.spark.sql.types.LongType, m.numBuckets)
      val expectRows = (1L to total.toLong).count(k =>
        kept(GraftFilters.bucketsOf(Seq(k),
          org.apache.spark.sql.types.LongType, m.numBuckets).head))
      val scans = graftScanRows(res)
      assert(scans.nonEmpty)
      assert(scans.min == expectRows,
        s"target scan read $scans rows, expected bucket-exact $expectRows of $total")
    }
  }

  test("composite-key delta MERGE narrows via the tuple hash") {
    withPlainPlans {
      n += 1
      val t = s"t$n"
      val total = 600
      (1 to total).map(k => (k.toLong, s"g${k % 3}", k * 10L))
        .toDF("k1", "k2", "cents").createOrReplaceTempView(s"drf_ck_src_$n")
      spark.sql(
        s"""CREATE TABLE drf.ns.$t USING graft
           |TBLPROPERTIES ('keys'='k1,k2', 'numBuckets'='8',
           |  'dml.mode'='delta')
           |AS SELECT * FROM drf_ck_src_$n""".stripMargin)
      Seq((100L, "g1", 1L), (200L, "g2", 2L)).toDF("sk1", "sk2", "sc")
        .createOrReplaceTempView("drf_ck_merge")
      val res = spark.sql(
        s"""MERGE INTO drf.ns.$t t USING drf_ck_merge s
           |ON t.k1 = s.sk1 AND t.k2 = s.sk2
           |WHEN MATCHED THEN UPDATE SET cents = s.sc
           |""".stripMargin)
      val got = spark.table(s"drf.ns.$t").as[(Long, String, Long)].collect()
      assert(got.count(r => r._3 <= 2L) == 2)
      assert(got.length == total)
      // the source-side bucket hash spans BOTH key columns — narrowing
      // needs no per-column cross-product
      val planStr = planNodes(res.queryExecution.executedPlan)
        .map(_.toString).mkString.toLowerCase
      assert(planStr.contains("dynamicpruning"))
      val scans = graftScanRows(res)
      assert(scans.nonEmpty)
      assert(scans.min < total, s"composite-key target scan was not narrowed ($scans)")
    }
  }

  test("MERGE with NOT MATCHED BY SOURCE must NOT filter the target") {
    withPlainPlans {
      val (name, root) = freshDeltaTable(40, buckets = 4)
      Seq(1L, 2L).toDF("sk").createOrReplaceTempView("drf_nmbs_src")
      val res = spark.sql(
        s"""MERGE INTO $name t USING drf_nmbs_src s ON t.k = s.sk
           |WHEN MATCHED THEN UPDATE SET v = 'kept'
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'swept'
           |""".stripMargin)
      // every target row outside the source had to be SEEN and updated
      // — a full-outer rewrite; source-key filtering here would lose
      // the sweep
      val got = spark.table(name).as[(Long, String, Long)].collect()
      assert(got.count(_._2 == "swept") == 38)
      assert(got.count(_._2 == "kept") == 2)
      val scans = graftScanRows(res)
      assert(scans.nonEmpty && scans.min == 40L,
        s"full-outer delta MERGE must scan the whole target ($scans)")
    }
  }

  test("non-replayable sources (LIMIT / rand) decline the filter, stay correct") {
    withPlainPlans {
      val (name, _) = freshDeltaTable(100, buckets = 4)
      // LIMIT without a total order: two executions may pick different
      // rows — re-running it as a pruning subquery could compute a
      // bucket set missing rows the join WILL match. The rule must
      // refuse; the merge must still apply.
      // (a LIMIT over literal VALUES would fold into a LocalRelation —
      // legitimately replayable; range() keeps the Limit node alive)
      spark.sql("SELECT id AS sk FROM range(1, 100) LIMIT 2")
        .createOrReplaceTempView("drf_lim_src")
      val res = spark.sql(
        s"""MERGE INTO $name t USING drf_lim_src s ON t.k = s.sk
           |WHEN MATCHED THEN UPDATE SET v = 'lim'""".stripMargin)
      assert(spark.table(name).where($"v" === "lim").count() == 2)
      val scans = graftScanRows(res)
      assert(scans.nonEmpty && scans.min == 100L,
        s"non-replayable source must not runtime-filter the target ($scans)")
    }
  }

  test("pure-delete subquery DELETE narrows its matching-key scan") {
    withPlainPlans {
      val total = 2000
      val (name, root) = freshDeltaTable(total, buckets = 8)
      Seq(500L, 1000L, 1500L, 2000L).toDF("dk")
        .createOrReplaceTempView("drf_del_keys")
      val res = spark.sql(
        s"DELETE FROM $name WHERE k IN (SELECT dk FROM drf_del_keys)")
      assert(spark.table(name).count() == total - 4)
      val m = SnapshotStore.readManifest(spark, root,
        SnapshotStore.latestVersion(spark, root).get)
      val kept = GraftFilters.bucketsOf(Seq(500L, 1000L, 1500L, 2000L),
        org.apache.spark.sql.types.LongType, m.numBuckets)
      val expectRows = (1L to total.toLong).count(k =>
        kept(GraftFilters.bucketsOf(Seq(k),
          org.apache.spark.sql.types.LongType, m.numBuckets).head))
      val scans = graftScanRows(res)
      assert(scans.nonEmpty)
      assert(scans.min == expectRows,
        s"delete's target scan read $scans rows, expected $expectRows")
    }
  }
}
