package graft.connector

import java.nio.file.Files

import graft.SparkSpec

/** ANSI NOT NULL columns: declared at CREATE, recorded in the
  * `_schema` breadcrumb, write-ENFORCED on every door (the guard is
  * fused into `writeVersionData`'s projection like CHECK and the
  * delta key contract) — which is what makes the non-nullable read
  * schema truthful for the optimizer.
  */
class NotNullSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-nn").toString
  spark.conf.set("spark.sql.catalog.gnn", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gnn.root", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gnn.a")

  test("a declared NOT NULL column rejects nulls on the SQL door and presents non-nullable") {
    spark.sql("""CREATE TABLE gnn.a.t (k BIGINT, v STRING NOT NULL)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gnn.a.t VALUES (1, 'a')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gnn.a.t VALUES (2, CAST(NULL AS STRING))")
    }
    assert(e.getMessage.toLowerCase.contains("null"), e.getMessage)
    // the failed insert left nothing
    assert(spark.table("gnn.a.t").count() == 1)
    // schema presents the declaration
    val f = spark.table("gnn.a.t").schema("v")
    assert(!f.nullable, "declared NOT NULL column must present non-nullable")
    // inserting FROM a nullable source works when the data is null-free
    spark.range(5, 8).selectExpr("id AS k", "concat('v', id) AS v")
      .createOrReplaceTempView("gnn_src")
    spark.sql("INSERT INTO gnn.a.t SELECT k, v FROM gnn_src")
    assert(spark.table("gnn.a.t").count() == 4)
  }

  test("the path/library door is equally enforced") {
    spark.sql("""CREATE TABLE gnn.a.p (k BIGINT, v BIGINT NOT NULL)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gnn.a.p VALUES (1, 10)")
    val root = s"$warehouse/a/p"
    val e = intercept[Exception] {
      Seq((2L, null.asInstanceOf[java.lang.Long])).toDF("k", "v")
        .write.format("graft").mode("append").save(root)
    }
    assert(e.getMessage.toLowerCase.contains("null"), e.getMessage)
    assert(spark.read.format("graft").load(root).count() == 1)
    // a drift write OMITTING the column null-fills its rows — the
    // merge materializes the null and the guard catches it
    val omit = intercept[Exception] {
      Seq(3L).toDF("k").write.format("graft").mode("append").save(root)
    }
    assert(omit.getMessage.toLowerCase.contains("null"), omit.getMessage)
    assert(spark.read.format("graft").load(root).count() == 1)
    // the OVERWRITE door has no merge to materialize the null — the
    // write must refuse up front rather than land files lacking the
    // column (reads would null-fill under a non-nullable schema)
    val over = intercept[Exception] {
      Seq(4L).toDF("k").write.format("graft").mode("overwrite").save(root)
    }
    assert(over.getMessage.contains("omits declared NOT NULL"), over.getMessage)
    assert(spark.read.format("graft").load(root).count() == 1)
  }

  test("the presence check matches case-insensitively, like every other resolution") {
    spark.sql("""CREATE TABLE gnn.a.ci (id BIGINT, v BIGINT NOT NULL)
                 USING graft TBLPROPERTIES ('keys'='id', 'numBuckets'='2')""")
    val root = s"$warehouse/a/ci"
    // a library frame supplying 'ID'/'V' for declared 'id'/'v' resolves
    // fine under Spark's default resolver — the guard must not
    // spuriously reject it as OMITTING the NOT NULL column...
    Seq((1L, 10L)).toDF("ID", "V")
      .write.format("graft").mode("append").save(root)
    assert(spark.read.format("graft").load(root).count() == 1)
    // ...and must still ENFORCE through the differently-cased name
    val e = intercept[Exception] {
      Seq((2L, null.asInstanceOf[java.lang.Long])).toDF("ID", "V")
        .write.format("graft").mode("append").save(root)
    }
    assert(e.getMessage.toLowerCase.contains("null"), e.getMessage)
    assert(spark.read.format("graft").load(root).count() == 1)
  }
}
