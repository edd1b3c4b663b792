package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.streaming.StreamPipeline

/** End-to-end drive of the streaming surface: staged CSV ingest with
  * audit columns → watermarked windowed rollup → continuous SCD1
  * upsert into a parquet target. Usage: `runMain graft.StreamDemo
  * [workDir]` — prints the rollup and the merged target, then exits.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0)
      else Files.createTempDirectory("graft_stream_demo").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stage = s"$work/stage"
    Files.createDirectories(Paths.get(stage))
    Files.writeString(Paths.get(s"$stage/day1.csv"),
      """id,name,ts
        |1,alpha,2024-01-01 00:10:00
        |2,beta,2024-01-01 00:20:00
        |3,gamma,2024-01-01 01:10:00
        |""".stripMargin)
    Files.writeString(Paths.get(s"$stage/day2.csv"),
      """id,name,ts
        |1,alpha-v2,2024-01-02 00:10:00
        |4,delta,2024-01-02 00:20:00
        |""".stripMargin)

    val schema = StructType.fromDDL("id INT, name STRING, ts TIMESTAMP")
    val staged = StreamPipeline.auditedCsvStream(spark, stage, schema)

    // consumption-layer rollup: events per hour
    val rollup = staged.withColumn("event_type", lit("ingest"))
      .withColumn("value", lit(1.0))
      .transform(df => StreamPipeline.windowedCounts(df, "ts", "10 minutes", "1 hour"))
    val rq = rollup.writeStream.format("memory").queryName("rollup")
      .outputMode("complete").start()

    // clean-layer continuous SCD1 merge
    val uq = StreamPipeline.scd1UpsertSink(staged, s"$work/clean_target",
      s"$work/ckpt", Seq("id"), Seq(col("ts").desc))

    rq.processAllAvailable(); uq.processAllAvailable()
    rq.stop(); uq.stop()

    println("=== hourly rollup ===")
    spark.table("rollup").orderBy("window_start").show(truncate = false)
    println("=== SCD1-merged clean target (latest per id) ===")
    spark.read.parquet(s"$work/clean_target")
      .orderBy("id").show(truncate = false)

    // batch path over the same staged files: stage → typed → clean
    println("=== batch StageReader clean snapshot (stage → try_cast → SCD1) ===")
    val batchStage = graft.sources.StageReader.csv(spark, stage, Seq("id", "name", "ts"))
    graft.sources.StageReader.cleanSnapshot(batchStage,
        Seq("id" -> "BIGINT", "ts" -> "TIMESTAMP"), Seq("id"), Seq(col("ts").desc))
      .select("id", "name", "ts", "_stg_file_name")
      .orderBy("id").show(truncate = false)
    spark.stop()
  }
}
