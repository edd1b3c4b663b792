package graft.connector

import java.nio.file.Files

import graft.SparkSpec

/** GENERATED ALWAYS AS columns: declared at CREATE (analyzer-validated
  * expression, recorded as a `generated.<col>` table contract), then
  * COMPUTED-or-ENFORCED by every write path in the same fused
  * projection as CHECK constraints — a NULL value means "engine,
  * compute it" (covers INSERTs omitting the column), a non-null value
  * must equal the generation expression or the write refuses. The
  * contract rides `_props`, so SQL INSERT, row-level rewrites, and
  * library writes all honor it.
  */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-gen").toString
  locally {
    spark.conf.set("spark.sql.catalog.gen", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gen.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gen.ns")
  }

  test("omitted or NULL generated column is computed; wrong values refuse; right values pass") {
    spark.sql("""CREATE TABLE gen.ns.t1 (
                   k BIGINT, cents BIGINT,
                   dollars BIGINT GENERATED ALWAYS AS (cents DIV 100))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    // omitted column list → analyzer null-fills → engine computes
    spark.sql("INSERT INTO gen.ns.t1 (k, cents) VALUES (1, 250)")
    // explicit NULL → recompute
    spark.sql("INSERT INTO gen.ns.t1 VALUES (2, 399, NULL)")
    // supplied AND correct → accepted
    spark.sql("INSERT INTO gen.ns.t1 VALUES (3, 100, 1)")
    assert(spark.table("gen.ns.t1").as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 250L, 2L), (2L, 399L, 3L), (3L, 100L, 1L)))
    // supplied and WRONG → the write refuses, naming the column
    val bad = intercept[Throwable] {
      spark.sql("INSERT INTO gen.ns.t1 VALUES (4, 100, 42)")
    }
    def rootMsg(t: Throwable): String = {
      var c = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(rootMsg(bad).contains("generated column 'dollars'"))
    assert(spark.table("gen.ns.t1").count() == 3) // nothing landed
  }

  test("row-level UPDATE: stale derived value refuses; SET ... NULL recomputes") {
    spark.sql("""CREATE TABLE gen.ns.t2 (
                   k BIGINT, cents BIGINT,
                   dollars BIGINT GENERATED ALWAYS AS (cents DIV 100))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gen.ns.t2 (k, cents) VALUES (1, 250), (2, 1000)")
    // changing a generation source without touching the derived column
    // would keep a stale value — the write refuses rather than corrupt
    val stale = intercept[Throwable] {
      spark.sql("UPDATE gen.ns.t2 SET cents = 999 WHERE k = 1")
    }
    // setting the generated column to NULL recomputes it in the rewrite
    spark.sql("UPDATE gen.ns.t2 SET cents = 999, dollars = NULL WHERE k = 1")
    assert(spark.table("gen.ns.t2").as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 999L, 9L), (2L, 1000L, 10L)))
    assert(stale != null)
  }

  test("contract guards: no generated merge keys, no raw/raw-dropped TBLPROPERTIES") {
    val onKey = intercept[Throwable] {
      spark.sql("""CREATE TABLE gen.ns.bad (
                     k BIGINT GENERATED ALWAYS AS (v + 1), v BIGINT)
                   USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    }
    assert(onKey.getMessage.contains("merge key"))
    val raw = intercept[Throwable] {
      spark.sql("""CREATE TABLE gen.ns.bad2 (k BIGINT, v BIGINT)
                   USING graft TBLPROPERTIES ('keys'='k',
                     'generated.v'='k + 1')""")
    }
    assert(raw.getMessage.contains("GENERATED ALWAYS AS"))
    spark.sql("""CREATE TABLE gen.ns.t3 (
                   k BIGINT, v BIGINT, w BIGINT GENERATED ALWAYS AS (v * 2))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    val set = intercept[Throwable] {
      spark.sql("ALTER TABLE gen.ns.t3 SET TBLPROPERTIES ('generated.v'='k')")
    }
    assert(set.getMessage.contains("GENERATED ALWAYS"))
    val unset = intercept[Throwable] {
      spark.sql("ALTER TABLE gen.ns.t3 UNSET TBLPROPERTIES ('generated.w')")
    }
    assert(unset.getMessage.contains("cannot be dropped"))
  }

  test("multi-line generation expressions survive the props encoding; columns() surfaces them") {
    spark.sql("""CREATE TABLE gen.ns.t5 (
                   k BIGINT, cents BIGINT,
                   band STRING GENERATED ALWAYS AS (
                     CASE WHEN cents >= 100 THEN 'HI'
                          ELSE 'LO' END))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gen.ns.t5 (k, cents) VALUES (1, 250), (2, 50)")
    assert(spark.table("gen.ns.t5").select("k", "band").as[(Long, String)]
      .collect().toSet == Set((1L, "HI"), (2L, "LO")))
    val cat = spark.sessionState.catalogManager.catalog("gen")
      .asInstanceOf[GraftCatalog]
    val tbl = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns"), "t5"))
    val band = tbl.columns().find(_.name == "band").get
    assert(Option(band.generationExpression()).exists(_.contains("CASE")))
  }

  test("the contract binds the library/path write doors too") {
    spark.sql("""CREATE TABLE gen.ns.t4 (
                   k BIGINT, cents BIGINT,
                   dollars BIGINT GENERATED ALWAYS AS (cents DIV 100))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    val root = s"$warehouse/ns/t4"
    // path-based append with the column omitted → computed
    Seq((10L, 501L, Option.empty[Long])).toDF("k", "cents", "dollars")
      .write.format("graft").mode("append").save(root)
    assert(spark.table("gen.ns.t4").as[(Long, Long, Long)].collect().toSet ==
      Set((10L, 501L, 5L)))
    // path-based append with a lying value → refused
    val bad = intercept[Throwable] {
      Seq((11L, 100L, 77L)).toDF("k", "cents", "dollars")
        .write.format("graft").mode("append").save(root)
    }
    var c: Throwable = bad; var found = false
    while (c != null && !found) {
      found = Option(c.getMessage).exists(_.contains("generated column"))
      c = c.getCause
    }
    assert(found)
    // an OVERWRITE whose frame omits the column entirely (no merge to
    // null-fill it) gets the value COMPUTED, never files lacking the
    // column that would null-fill on read under the contract
    Seq((20L, 1234L)).toDF("k", "cents")
      .write.format("graft").mode("overwrite").save(root)
    assert(spark.table("gen.ns.t4").as[(Long, Long, Long)].collect().toSet ==
      Set((20L, 1234L, 12L)))
    // a CASE-VARIANT supplied column is the SAME column under Spark's
    // default resolution: a lying value must refuse, never be treated
    // as "omitted" and silently replaced by the computed one
    val caseLie = intercept[Throwable] {
      Seq((21L, 100L, 77L)).toDF("k", "cents", "Dollars")
        .write.format("graft").mode("append").save(root)
    }
    var cc: Throwable = caseLie; var cfound = false
    while (cc != null && !cfound) {
      cfound = Option(cc.getMessage).exists(_.contains("generated column"))
      cc = cc.getCause
    }
    assert(cfound, s"case-variant lying value must refuse: $caseLie")
  }
}
