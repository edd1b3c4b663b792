package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("partition-pruned read touches only the filtered directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = (1 to 300).map(i => (i.toLong, s"2024-0${i % 3 + 1}", s"p$i"))
      .toDF("id", "month", "payload")
    Bucketing.writePartitioned(df, dir, Seq("month"))
    val pruned = spark.read.parquet(dir).where($"month" === "2024-02")
    assert(pruned.collect().length == 100) // executes this exact plan → metrics below
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // the partition predicate is applied at planning time...
    assert(scan.metadata("PartitionFilters").contains("month"))
    // ...and only the files of the one matching month= directory are read
    val filesInMatchingDir = new java.io.File(s"$dir/month=2024-02")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val totalFiles = scan.relation.location.inputFiles.length
    assert(scan.metrics("numFiles").value == filesInMatchingDir)
    assert(filesInMatchingDir < totalFiles)
  }

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
