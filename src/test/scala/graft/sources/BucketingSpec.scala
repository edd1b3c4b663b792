package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two tables bucketed on the join key runs without a shuffle exchange") {
    val left = (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("k", "l_payload")
    val right = (1 to 1000).map(i => (i.toLong, s"c$i")).toDF("k", "r_payload")
    Bucketing.writeBucketed(left, "graft_bkt_left", "k", 4)
    Bucketing.writeBucketed(right, "graft_bkt_right", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_left")
        .join(spark.table("graft_bkt_right"), "k")
      assert(joined.count() == 1000)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, "bucketed join must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }
}
