package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.SparkSpec
import graft.store.SnapshotStore

/** ANALYZE → optimizer statistics: `CALL system.analyze` computes
  * per-column NDV/null/min-max in one pass, the scan reports them via
  * DSv2 `columnStats`, and Spark's relation statistics carry them —
  * version-pinned, so any later commit silently retires them until
  * the next ANALYZE.
  */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-analyze").toString
  spark.conf.set("spark.sql.catalog.gan", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gan.root", warehouse)

  private def attrStats(table: String) = {
    val plan = spark.table(table).queryExecution.optimizedPlan
    val rel = plan.collectFirst { case r: DataSourceV2ScanRelation => r }.get
    rel.stats.attributeStats.map { case (a, s) => a.name -> s }
  }

  test("CALL system.analyze publishes stats; the scan reports them; staleness retires them") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gan.s")
    spark.sql("""CREATE TABLE gan.s.t (k BIGINT, cat STRING, amt DOUBLE)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='4')""")
    spark.sql("""INSERT INTO gan.s.t
                 SELECT id, CASE WHEN id % 2 = 0 THEN concat('c', id % 5) END,
                        CAST(id AS DOUBLE) / 4 FROM range(0, 200)""")

    // before ANALYZE: no column stats
    assert(attrStats("gan.s.t").isEmpty)

    val out = spark.sql("CALL gan.system.analyze(table => 's.t')").collect().head
    assert(out.getAs[Long]("version") == 1L)
    assert(out.getAs[Int]("analyzed_columns") == 3)
    assert(out.getAs[Long]("rows") == 200L)

    val st = attrStats("gan.s.t")
    assert(st.keySet == Set("k", "cat", "amt"))
    // exact facts
    assert(st("k").nullCount.contains(BigInt(0)))
    assert(st("cat").nullCount.contains(BigInt(100))) // odd ids → NULL
    assert(st("k").min.contains(0L) && st("k").max.contains(199L))
    assert(st("amt").min.contains(0.0d) && st("amt").max.contains(49.75d))
    // HLL ndv within 10%
    def ndv(n: String) = st(n).distinctCount.get.toLong
    assert(math.abs(ndv("k") - 200) <= 20)
    assert(math.abs(ndv("cat") - 5) <= 1)
    // string length moments ("c0".."c4" → len 2), no string bounds
    assert(st("cat").avgLen.contains(2L) && st("cat").maxLen.contains(2L))
    assert(st("cat").min.isEmpty && st("cat").max.isEmpty)

    // a new commit retires the stats (version pin) …
    spark.sql("INSERT INTO gan.s.t VALUES (1000, 'zz', 1.0)")
    assert(attrStats("gan.s.t").isEmpty)
    // … and re-ANALYZE refreshes them at the new version
    spark.sql("CALL gan.system.analyze(table => 's.t')")
    val st2 = attrStats("gan.s.t")
    assert(st2("k").max.contains(1000L))
    assert(st2("cat").maxLen.contains(2L))
  }

  test("analyze: explicit column list, unknown/unanalyzable columns refuse") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gan.c")
    spark.sql("""CREATE TABLE gan.c.t (k BIGINT, v STRING, e ARRAY<DOUBLE>)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gan.c.t VALUES (1, 'a', array(1.0)), (2, 'b', array(2.0))")
    val out = spark.sql(
      "CALL gan.system.analyze(table => 'c.t', columns => 'k')").collect().head
    assert(out.getAs[Int]("analyzed_columns") == 1)
    val st = attrStats("gan.c.t")
    assert(st.keySet == Set("k"))

    val bad = intercept[Throwable] {
      spark.sql("CALL gan.system.analyze(table => 'c.t', columns => 'nope')")
    }
    assert(bad.getMessage.contains("no such column"))
    val unan = intercept[Throwable] {
      spark.sql("CALL gan.system.analyze(table => 'c.t', columns => 'e')")
    }
    assert(unan.getMessage.contains("unanalyzable"))
  }

  test("content-preserving maintenance re-pins statistics; DML still retires them") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gan.m")
    spark.sql("""CREATE TABLE gan.m.t (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gan.m.t SELECT id, 'a' FROM range(0, 100)")
    spark.sql("INSERT INTO gan.m.t SELECT id, 'b' FROM range(100, 200)")
    spark.sql("CALL gan.system.analyze(table => 'm.t')")
    assert(attrStats("gan.m.t").nonEmpty)
    // compact mints a new version over the SAME live rows — the
    // ANALYZE result re-pins instead of silently retiring
    spark.sql("CALL gan.system.compact(table => 'm.t')")
    val st = attrStats("gan.m.t")
    assert(st.nonEmpty && st("k").max.contains(199L))
    // a content-CHANGING commit still retires them
    spark.sql("INSERT INTO gan.m.t VALUES (999, 'z')")
    assert(attrStats("gan.m.t").isEmpty)
  }

  test("stats survive the library path too and pin to the analyzed version") {
    val root = Files.createTempDirectory("graft-analyze-lib").toString + "/t"
    val df = Seq((1L, "x"), (2L, "y"), (3L, null.asInstanceOf[String]))
      .toDF("k", "v")
    SnapshotStore.init(spark, root, df, Seq("k"), numBuckets = 2)
    val ts = SnapshotStore.analyze(spark, root)
    assert(ts.rows == 3 && ts.cols("v").nullCount == 1)
    val back = SnapshotStore.readColStats(spark, root).get
    assert(back == ts)
  }
}
