package graft

import org.apache.spark.sql.functions._

/** The storage query keys (w01/w02) against a Spark-side recomputation
  * of their DuckDB oracles — the in-repo guard that the Scala side and
  * the oracle SQL can't drift apart unnoticed between gate runs.
  */
class QueriesStoreSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("w01_table_roundtrip ≡ relational CASE reconstruction over raw orders") {
    val got = QueriesStore.w01(spark, d)
      .as[(String, Long, Long)].collect().toSet
    val expected = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderkey") % 10 === 0, "X").otherwise(col("o_orderstatus"))
          .as("status"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)").as("cents"))
      .where(col("o_custkey") <= 500)
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("w02_change_feed ≡ reconstructed insert/pre/post history") {
    val got = QueriesStore.w02(spark, d)
      .as[(Long, String, String, Long)].collect().toSet
    val o = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderstatus").as("status"))
    val inserts = o.select(col("o_orderkey"), col("status"),
      lit("insert").as("ct"), lit(0L).as("cv"))
    val touched = o.where(col("o_orderkey") % 10 === 0)
    val pre = touched.select(col("o_orderkey"), col("status"),
      lit("update_preimage").as("ct"), lit(1L).as("cv"))
    val post = touched.select(col("o_orderkey"), lit("X").as("status"),
      lit("update_postimage").as("ct"), lit(1L).as("cv"))
    val expected = inserts.unionByName(pre).unionByName(post)
      .as[(Long, String, String, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }
}
