package graft.connector

import java.nio.file.Files

import graft.SparkSpec

/** `write.clustered=true` (optimized-write analog): one exchange pins
  * each bucket to a single task, so every commit lands exactly one
  * file per touched bucket — zero fragmentation for trickle-upsert
  * tables, at the cost of an extra shuffle of the rewrite data.
  */
class ClusteredWriteSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-cw").toString
  locally {
    spark.conf.set("spark.sql.catalog.cw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cw.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cw.ns")
  }

  private def filesPerBucket(table: String): Map[Int, Int] =
    spark.sql(s"CALL cw.system.detail(table => '$table')")
      .select("bucket", "files").as[(Int, Int)].collect().toMap

  test("clustered commits land ONE file per touched bucket; unclustered fragment") {
    // AQE's partition coalescing hides fragmentation on toy data —
    // pin it off so the control shows the real many-files shape a big
    // commit produces
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      for (t <- Seq("tc", "tu")) {
        val prop = if (t == "tc") ", 'write.clustered'='true'" else ""
        spark.sql(s"""CREATE TABLE cw.ns.$t (k BIGINT, v STRING)
                      USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2'$prop)""")
        for (i <- 0 until 3)
          spark.sql(s"""INSERT INTO cw.ns.$t
                        SELECT /*+ REPARTITION(8) */ id, 'v$i'
                        FROM range(${i * 1000}, ${i * 1000 + 1000})""")
      }
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val clustered = filesPerBucket("ns.tc")
    val control = filesPerBucket("ns.tu")
    // a bucket's files are its CURRENT version dir's (CoW repoints on
    // rewrite): clustered → the last merge wrote exactly one file per
    // bucket
    assert(clustered == Map(0 -> 1, 1 -> 1))
    // the unclustered control fragments: one file per shuffle
    // partition holding the bucket in the last rewrite
    assert(control.values.sum > clustered.values.sum)
    // same data lands either way
    assert(spark.table("cw.ns.tc").orderBy("k").collect().toSeq ==
      spark.table("cw.ns.tu").orderBy("k").collect().toSeq)
  }

  test("an invalid write.clustered value refuses at CREATE and ALTER") {
    val atCreate = intercept[Throwable] {
      spark.sql("""CREATE TABLE cw.ns.bad (k BIGINT, v STRING)
                   USING graft TBLPROPERTIES ('keys'='k',
                     'write.clustered'='TRUE')""")
    }
    assert(atCreate.getMessage.contains("'true' or 'false'"))
    spark.sql("""CREATE TABLE cw.ns.ok (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    val atAlter = intercept[Throwable] {
      spark.sql("ALTER TABLE cw.ns.ok SET TBLPROPERTIES ('write.clustered'='yes')")
    }
    assert(atAlter.getMessage.contains("'true' or 'false'"))
  }

  test("a case-variant property name still engages the clustering") {
    spark.sql("""CREATE TABLE cw.ns.tcase (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2',
                   'Write.Clustered'='true')""")
    for (i <- 0 until 2)
      spark.sql(s"""INSERT INTO cw.ns.tcase
                    SELECT /*+ REPARTITION(8) */ id, 'v' FROM range(0, 500)""")
    assert(filesPerBucket("ns.tcase").values.forall(_ == 1))
  }
}
