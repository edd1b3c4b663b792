package graft.connector

import java.nio.file.Files

import graft.SparkSpec

/** `MERGE WITH SCHEMA EVOLUTION INTO` — Spark computes AddColumn
  * changes from the source's extra columns and routes them through
  * `alterTable` (gated on `TableCapability.AUTOMATIC_SCHEMA_EVOLUTION`);
  * graft's additive evolution is exactly that contract: new nullable
  * columns append, history null-fills, anything non-additive refuses
  * loudly.
  */
class MergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-mev").toString
  locally {
    spark.conf.set("spark.sql.catalog.mev", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mev.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mev.ns")
  }

  test("the source's extra column lands additively; history null-fills") {
    spark.sql("""CREATE TABLE mev.ns.t (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO mev.ns.t VALUES (1, 'a'), (2, 'b')")
    Seq((2L, "b2", "x2"), (3L, "c", "x3")).toDF("k", "v", "extra")
      .createOrReplaceTempView("mev_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mev.ns.t t
        |USING mev_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("mev.ns.t").columns.toSeq == Seq("k", "v", "extra"))
    assert(spark.table("mev.ns.t").as[(Long, String, Option[String])]
      .collect().toSet ==
      Set((1L, "a", None), (2L, "b2", Some("x2")), (3L, "c", Some("x3"))))
  }

  test("without the clause, a star MERGE resolves against the target alone — no silent evolution") {
    spark.sql("""CREATE TABLE mev.ns.t2 (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO mev.ns.t2 VALUES (1, 'a')")
    Seq((1L, "a2", "x")).toDF("k", "v", "extra")
      .createOrReplaceTempView("mev_src2")
    spark.sql(
      """MERGE INTO mev.ns.t2 t USING mev_src2 s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    // schema unchanged; matching columns updated; extra ignored
    assert(spark.table("mev.ns.t2").columns.toSeq == Seq("k", "v"))
    assert(spark.table("mev.ns.t2").as[(Long, String)].collect().toSet ==
      Set((1L, "a2")))
    // naming a column that exists nowhere remains an error
    val bad = intercept[Throwable] {
      spark.sql(
        """MERGE INTO mev.ns.t2 t USING mev_src2 s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.nope = s.v""".stripMargin)
    }
    assert(bad != null)
  }
}
