package graft.connector

import java.nio.file.Files

import graft.SparkSpec

/** Column DEFAULT values on graft tables: declared at CREATE (the
  * analyzer materializes them into every written row, so reads need no
  * default logic), changeable for FUTURE inserts via `ALTER COLUMN …
  * SET/DROP DEFAULT`, and explicitly refused on `ADD COLUMN` — history
  * null-fills by the additive-evolution contract, and a retroactive
  * default would lie about it. Defaults survive the first data landing
  * (footer schemas carry no metadata — the `_schema` breadcrumb
  * overlay is what keeps `INSERT` resolution working).
  */
class DefaultValueSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-defs").toString
  locally {
    spark.conf.set("spark.sql.catalog.defs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.defs.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS defs.ns")
  }

  test("CREATE-time DEFAULT fills omitted insert columns, before and after data lands") {
    spark.sql("""CREATE TABLE defs.ns.t1 (
                   k BIGINT, status STRING DEFAULT 'pending', cents BIGINT DEFAULT 0)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO defs.ns.t1 (k) VALUES (1)")
    assert(spark.table("defs.ns.t1").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "pending", 0L)))
    // data exists now (schema resolves from footers) — the breadcrumb
    // metadata overlay must keep the default alive
    spark.sql("INSERT INTO defs.ns.t1 (k, cents) VALUES (2, 7)")
    spark.sql("INSERT INTO defs.ns.t1 VALUES (3, 'done', 9)")
    assert(spark.table("defs.ns.t1").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "pending", 0L), (2L, "pending", 7L), (3L, "done", 9L)))
    // explicit DEFAULT keyword resolves too
    spark.sql("INSERT INTO defs.ns.t1 VALUES (4, DEFAULT, DEFAULT)")
    assert(spark.table("defs.ns.t1").where($"k" === 4)
      .as[(Long, String, Long)].head() == ((4L, "pending", 0L)))
  }

  test("SET DEFAULT changes future inserts only; DROP DEFAULT reverts to null") {
    spark.sql("""CREATE TABLE defs.ns.t2 (k BIGINT, v STRING DEFAULT 'a')
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO defs.ns.t2 (k) VALUES (1)")
    spark.sql("ALTER TABLE defs.ns.t2 ALTER COLUMN v SET DEFAULT 'b'")
    spark.sql("INSERT INTO defs.ns.t2 (k) VALUES (2)")
    // the row written under the old default keeps its materialized 'a'
    assert(spark.table("defs.ns.t2").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    spark.sql("ALTER TABLE defs.ns.t2 ALTER COLUMN v DROP DEFAULT")
    spark.sql("INSERT INTO defs.ns.t2 (k) VALUES (3)")
    assert(spark.table("defs.ns.t2").where($"k" === 3).head().isNullAt(1))
  }

  test("ADD COLUMN with DEFAULT refuses; add-then-SET-DEFAULT works") {
    spark.sql("""CREATE TABLE defs.ns.t3 (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO defs.ns.t3 VALUES (1, 'x')")
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE defs.ns.t3 ADD COLUMN score BIGINT DEFAULT 5"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("retroactive"))))
    // the documented path: add (history null-fills), then default for
    // future inserts
    spark.sql("ALTER TABLE defs.ns.t3 ADD COLUMN score BIGINT")
    spark.sql("ALTER TABLE defs.ns.t3 ALTER COLUMN score SET DEFAULT 5")
    spark.sql("INSERT INTO defs.ns.t3 (k, v) VALUES (2, 'y')")
    val rows = spark.table("defs.ns.t3").select("k", "score")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(rows == Set((1L, None), (2L, Some(5L))))
  }
}
