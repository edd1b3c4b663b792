package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The broker-less Kafka ingest contract: [[KafkaIngest.parseJsonPayload]]
  * is driven end-to-end from a MemoryStream emitting the exact wire
  * schema the kafka source would produce.
  */
class KafkaIngestSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** One record as the kafka source would emit it. */
  private case class KafkaRecord(key: Array[Byte], value: Array[Byte],
      topic: String, partition: Int, offset: Long,
      timestamp: Timestamp, timestampType: Int)

  private def rec(key: String, json: String, offset: Long,
                  ts: String = "2024-01-01 00:00:00") =
    KafkaRecord(key.getBytes("UTF-8"), json.getBytes("UTF-8"),
      "locations", 0, offset, Timestamp.valueOf(ts), 0)

  private val cols = Seq("loc_id", "city", "state")
  private val casts = Seq("loc_id" -> "bigint")

  test("wire frame of the MemoryStream stand-in matches the kafka source schema") {
    val in = MemoryStream[KafkaRecord]
    // encoder-derived nullability differs for primitives; names+types must match
    assert(in.toDF().schema.map(f => (f.name, f.dataType)) ==
      KafkaIngest.recordSchema.map(f => (f.name, f.dataType)))
  }

  test("parseJsonPayload: JSON value -> stage columns, kafka coords -> audit columns") {
    val in = MemoryStream[KafkaRecord]
    val staged = KafkaIngest.typedStream(in.toDF(), cols, casts)
    val q = staged.writeStream.format("memory").queryName("kstage")
      .outputMode("append").start()
    try {
      in.addData(
        rec("7", """{"loc_id": "7", "city": "Pune", "state": "MH"}""", 0L),
        rec("8", """{"loc_id": "8", "city": "Delhi"}""", 1L),            // missing field -> null
        rec("9", """{"loc_id": "oops", "city": "X", "state": "Y"}""", 2L)) // bad cast -> null
      q.processAllAvailable()
      val rows = spark.table("kstage")
        .select($"loc_id", $"city", $"state", $"_kafka_key", $"_kafka_topic",
          $"_kafka_offset", $"_stg_file_load_ts".cast("string"))
        .as[(Option[Long], String, Option[String], String, String, Long, String)]
        .collect().sortBy(_._6)
      assert(rows.toSeq == Seq(
        (Some(7L), "Pune", Some("MH"), "7", "locations", 0L, "2024-01-01 00:00:00"),
        (Some(8L), "Delhi", None, "8", "locations", 1L, "2024-01-01 00:00:00"),
        (None, "X", Some("Y"), "9", "locations", 2L, "2024-01-01 00:00:00")))
    } finally q.stop()
  }

  test("kafka feed drives the incremental SCD1 clean layer end-to-end") {
    val dir = Files.createTempDirectory("graft_kafka").toString
    val in = MemoryStream[KafkaRecord]
    val staged = KafkaIngest.typedStream(in.toDF(), cols, casts)
    val q = staged.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        StreamPipeline.upsertBatch(batch, s"$dir/clean",
          Seq("loc_id"), Seq(col("_kafka_offset").desc))
      }
      .start()
    try {
      in.addData(rec("7", """{"loc_id": "7", "city": "Pune", "state": "MH"}""", 0L))
      q.processAllAvailable()
      in.addData(rec("7", """{"loc_id": "7", "city": "Pune East", "state": "MH"}""", 1L))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/clean")
        .select($"loc_id", $"city").as[(Long, String)].collect().toSeq
      assert(out == Seq((7L, "Pune East"))) // newest offset wins
    } finally q.stop()
  }

  test("kafka feed -> transactional snapshot table: atomic version per batch") {
    val dir = Files.createTempDirectory("graft_kafka_snap").toString
    val in = MemoryStream[KafkaRecord]
    val staged = KafkaIngest.typedStream(in.toDF(), cols, casts)
    val q = graft.store.SnapshotStore.scd1SnapshotSink(
      staged, s"$dir/tbl", s"$dir/ckpt",
      Seq("loc_id"), Seq(col("_kafka_offset").desc), numBuckets = 4)
    try {
      in.addData(rec("7", """{"loc_id": "7", "city": "Pune", "state": "MH"}""", 0L),
        rec("8", """{"loc_id": "8", "city": "Delhi", "state": "DL"}""", 1L))
      q.processAllAvailable()
      in.addData(rec("7", """{"loc_id": "7", "city": "Pune East", "state": "MH"}""", 2L))
      q.processAllAvailable()
      val tbl = graft.store.SnapshotStore.read(spark, s"$dir/tbl")
        .select($"loc_id", $"city").as[(Long, String)].collect().toSet
      assert(tbl == Set((7L, "Pune East"), (8L, "Delhi")))
      // v0 = initial load, v1 = the update; v0 still time-travelable
      assert(graft.store.SnapshotStore.versions(spark, s"$dir/tbl") == Seq(0L, 1L))
      val v0 = graft.store.SnapshotStore.readVersion(spark, s"$dir/tbl", 0L)
        .select($"loc_id", $"city").as[(Long, String)].collect().toSet
      assert(v0 == Set((7L, "Pune"), (8L, "Delhi")))
    } finally q.stop()
  }

  test("stream() wiring reaches kafka source resolution (connector absent here)") {
    val src = KafkaIngest.KafkaSource("broker-1:9092,broker-2:9092", "locations",
      startingOffsets = "latest", maxOffsetsPerTrigger = Some(10000L))
    val e = intercept[Exception] { KafkaIngest.stream(spark, src) }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }
}
