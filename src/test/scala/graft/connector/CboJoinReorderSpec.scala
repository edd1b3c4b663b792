package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.SparkSpec

/** ANALYZE statistics must CHANGE PLANS, not just be reported: under
  * `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled`,
  * Spark's cost-based join reorder consumes the graft scan's
  * statistics ([[GraftScan.estimateStatistics]]) and rewrites a star
  * join's order — the fact⋈dim⋈dim shape the reference's consumption
  * queries take (`/root/reference/final_proc.sql:76-83`), which
  * Snowflake reorders invisibly for every query.
  *
  * Two levels, both pinned: graft always reports manifest-exact
  * rowCounts, so CBO reorders by TABLE SIZE with no ANALYZE at all;
  * and ANALYZE's per-column NDVs refine that to JOIN-OUTPUT costing —
  * enough to overturn the size-only order when the smaller dim is the
  * less selective one.
  */
class CboJoinReorderSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-cbo").toString
  locally {
    spark.conf.set("spark.sql.catalog.gcbo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcbo.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcbo.s")
  }

  /** Scan leaves of the optimized plan in join order (preorder over a
    * left-deep tree), identified by table-root suffix.
    */
  private def joinOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.relation.table.name()
    }.map(n => n.split('/').last.stripSuffix("`"))

  private def withCbo[A](body: => A): A = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try body finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
  }

  test("CBO reorders the star join; ANALYZE NDVs overturn the size-only order") {
    // fact: 10k rows; a_id has 2000 distinct values, b_id has 5
    spark.sql("""CREATE TABLE gcbo.s.fact (k BIGINT, a_id BIGINT, b_id BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='4')""")
    spark.sql("""INSERT INTO gcbo.s.fact
                 SELECT id, id % 2000, id % 5 FROM range(10000)""")
    // dim_a: 1000 rows covering HALF the fact's a_id values — bigger
    // but SELECTIVE (fact⋈dim_a ≈ 10k·1000/2000 = 5k rows); dim_b:
    // 5 rows covering ALL b_id values — tiny but reduces NOTHING
    // (fact⋈dim_b ≈ 10k)
    spark.sql("""CREATE TABLE gcbo.s.dim_a (a_id BIGINT, a_name STRING)
                 USING graft TBLPROPERTIES ('keys'='a_id', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gcbo.s.dim_a SELECT id, concat('a', id) FROM range(1000)")
    spark.sql("""CREATE TABLE gcbo.s.dim_b (b_id BIGINT, b_name STRING)
                 USING graft TBLPROPERTIES ('keys'='b_id', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gcbo.s.dim_b SELECT id, concat('b', id) FROM range(5)")

    // textual order: the selective dim first (already optimal)
    val q = """SELECT f.k, a.a_name, b.b_name
               FROM gcbo.s.fact f
               JOIN gcbo.s.dim_a a ON f.a_id = a.a_id
               JOIN gcbo.s.dim_b b ON f.b_id = b.b_id"""

    // CBO off: the textual order stands, stats or not
    val noCbo = joinOrder(spark.sql(q))
    assert(noCbo == Seq("fact", "dim_a", "dim_b"), s"no-CBO order: $noCbo")

    // CBO without ANALYZE: only the manifest rowCounts exist, so the
    // reorder goes by table size — the 5-row dim_b joins first even
    // though it reduces nothing. (Already a plan CHANGE driven by
    // graft-reported stats — and exactly the order NDVs must fix.)
    val sizeOnly = withCbo(joinOrder(spark.sql(q)))
    assert(sizeOnly == Seq("fact", "dim_b", "dim_a"),
      s"size-only CBO order: $sizeOnly")

    Seq("s.fact", "s.dim_a", "s.dim_b").foreach(t =>
      spark.sql(s"CALL gcbo.system.analyze(table => '$t')"))

    // CBO with ANALYZE NDVs: join-output costing overturns the
    // size-only order — the SELECTIVE dim joins first (5k intermediate
    // rows beat 10k), despite being 200× larger
    val withStats = withCbo(joinOrder(spark.sql(q)))
    assert(withStats == Seq("fact", "dim_a", "dim_b"),
      s"ANALYZE NDVs did not overturn the size-only order: $withStats")

    // and the reordered plan is RIGHT: results identical either way
    val rows = withCbo(spark.sql(q).count())
    assert(rows == spark.sql(q).count() && rows == 5000L)
  }
}
