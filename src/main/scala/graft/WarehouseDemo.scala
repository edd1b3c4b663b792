package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.pipeline.Warehouse

/** Runnable end-to-end warehouse demo: stages a small multi-entity
  * csv+json layout (the reference's restaurant schema shape), runs the
  * batch pipeline, then drops a late-arriving staged file and runs the
  * incremental (AvailableNow) pass — the FINAL_PROCEDURE + cron TASK
  * chain (`/root/reference/with procedures/final_proc.sql:29-40`,
  * `task_proc.sql:32-40`) as two invocations.
  *
  * Run: `sbt "runMain graft.WarehouseDemo /tmp/graft_wh_demo"`
  */
object WarehouseDemo {

  private def write(path: String, content: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), content)
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft_wh_demo")
    val spark = SparkSession.builder()
      .appName("graft-warehouse-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      write(s"$root/stage/location/location.csv",
        """loc_id,city,state,tier,updated_at,rec_id
          |1,Pune,MH,2,2024-01-01 00:00:00,101
          |2,Delhi,DL,1,2024-01-01 00:00:00,102
          |3,Chennai,TN,1,2024-01-01 00:00:00,103
          |""".stripMargin)
      write(s"$root/stage/restaurant/restaurant.csv",
        """rest_id,rest_name,loc_id,updated_at,rec_id
          |10,Spice Hub,1,2024-01-01 00:00:00,201
          |11,Dosa House,2,2024-01-01 00:00:00,202
          |12,Biryani Corner,1,2024-01-01 00:00:00,203
          |""".stripMargin)
      write(s"$root/stage/delivery_agent/agents.json",
        """{"agent_id": "5", "agent_name": "Arjun", "phone": "9876543210", "updated_at": "2024-01-01 00:00:00", "rec_id": "301"}
          |{"agent_id": "6", "agent_name": "Meera", "phone": "9123456780", "updated_at": "2024-01-01 00:00:00", "rec_id": "302"}
          |""".stripMargin)

      val cfg = Warehouse.Config(
        entities = Seq(
          Warehouse.Entity("location", "csv", s"$root/stage/location",
            Seq("loc_id", "city", "state", "tier", "updated_at", "rec_id"),
            Seq("loc_id" -> "bigint", "tier" -> "int",
              "updated_at" -> "timestamp", "rec_id" -> "bigint"),
            Seq("loc_id"), "updated_at", "rec_id", scd2 = true,
            expectations = Seq(
              graft.pipeline.Expectations.Expectation("loc_id_set",
                org.apache.spark.sql.functions.col("loc_id").isNotNull,
                graft.pipeline.Expectations.Quarantine),
              graft.pipeline.Expectations.Expectation("tier_valid",
                org.apache.spark.sql.functions.col("tier").between(1, 3)))),
          Warehouse.Entity("restaurant", "csv", s"$root/stage/restaurant",
            Seq("rest_id", "rest_name", "loc_id", "updated_at", "rec_id"),
            Seq("rest_id" -> "bigint", "loc_id" -> "bigint",
              "updated_at" -> "timestamp", "rec_id" -> "bigint"),
            Seq("rest_id"), "updated_at", "rec_id"),
          Warehouse.Entity("delivery_agent", "json", s"$root/stage/delivery_agent",
            Seq("agent_id", "agent_name", "phone", "updated_at", "rec_id"),
            Seq("agent_id" -> "bigint", "updated_at" -> "timestamp", "rec_id" -> "bigint"),
            Seq("agent_id"), "updated_at", "rec_id")),
        facts = Seq(
          Warehouse.Fact("restaurant_by_city",
            Seq("clean/restaurant", "clean/location"),
            m => {
              import org.apache.spark.sql.functions._
              m("clean/restaurant").join(m("clean/location"), "loc_id")
                .groupBy("city").agg(count(lit(1)).as("n_restaurants"))
            })))

      println(s"[demo] batch run → $root/wh")
      val out = Warehouse.runBatch(spark, cfg, s"$root/wh",
        onExpectations = (e, m) => println(s"[demo]   expectations $e: $m"))
      out.keys.toSeq.sorted.foreach(k => println(f"[demo]   $k%-28s ${out(k).count()}%4d rows"))

      println("[demo] late file arrives; incremental (AvailableNow) pass")
      write(s"$root/stage/location/late.csv",
        """loc_id,city,state,tier,updated_at,rec_id
          |1,Pune,MH,1,2024-02-01 00:00:00,104
          |""".stripMargin)
      Warehouse.runIncremental(spark, cfg, s"$root/wh", s"$root/ckpt")
        .foreach(_.awaitTermination())
      Warehouse.runFacts(spark, cfg, s"$root/wh") // fact layer catches up
      val loc1 = spark.read.parquet(s"$root/wh/clean/location")
        .where(org.apache.spark.sql.functions.col("loc_id") === 1)
        .select("tier").collect().map(_.getInt(0)).toSeq
      println(s"[demo] location 1 tier after incremental upsert: $loc1 (expected List(1))")
      val dimVersions = spark.read.parquet(s"$root/wh/dim/location")
        .where(org.apache.spark.sql.functions.col("loc_id") === 1).count()
      println(s"[demo] location 1 SCD2 versions: $dimVersions (expected 2)")
    } finally spark.stop()
  }
}
