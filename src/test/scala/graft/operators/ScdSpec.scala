package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def feed = Seq(
    // (key, version-id, ts, payload)
    (1L, 10L, "2024-01-01 00:00:00", "v1"),
    (1L, 11L, "2024-01-02 00:00:00", "v2"),
    (1L, 12L, "2024-01-03 00:00:00", "v3"),
    (2L, 20L, "2024-01-01 12:00:00", "only"),
    (3L, 30L, "2024-01-05 00:00:00", "a"),
    (3L, 31L, "2024-01-05 00:00:00", "b") // same ts → tiebreak on id
  ).toDF("k", "id", "ts_s", "payload")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("Scd1.latestByKey keeps the newest version per key with total tie-break") {
    val out = Scd1.latestByKey(feed, Seq("k"), Seq(col("ts").desc, col("id").desc))
      .select("k", "id", "payload").as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 12L, "v3"), (2L, 20L, "only"), (3L, 31L, "b")))
  }

  test("Scd1.merge: delta overrides base on newer ts, keeps unmatched base rows") {
    val base = feed
    val delta = Seq((1L, 13L, "2024-02-01 00:00:00", "v4"),
      (9L, 90L, "2024-02-01 00:00:00", "new"))
      .toDF("k", "id", "ts_s", "payload")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Scd1.merge(base, delta, Seq("k"), Seq(col("ts").desc, col("id").desc))
      .select("k", "payload").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "v4"), (2L, "only"), (3L, "b"), (9L, "new")))
  }

  test("Scd2.buildHistory chains eff dates and flags exactly one current row per key") {
    val h = Scd2.buildHistory(feed, Seq("k"), "ts", "id")
    val k1 = h.where($"k" === 1).orderBy("id")
      .select($"id", $"eff_end_ts".isNull, $"current_flag")
      .as[(Long, Boolean, Boolean)].collect().toSeq
    assert(k1 == Seq((10L, false, false), (11L, false, false), (12L, true, true)))
    // eff_end of version n == eff_start of version n+1
    val chain = h.where($"k" === 1 && $"id" === 10)
      .select($"eff_end_ts".cast("string")).as[String].head()
    assert(chain == "2024-01-02 00:00:00")
    assert(h.where($"current_flag").count() == 3) // one per key
  }

  test("Scd2.asOf returns the version valid at the timestamp") {
    val h = Scd2.buildHistory(feed, Seq("k"), "ts", "id")
    val at = Scd2.asOf(h, lit("2024-01-02 12:00:00").cast("timestamp"))
      .where($"k" === 1).select("id").as[Long].collect().toSeq
    assert(at == Seq(11L))
  }

  test("Scd2.applyDelta extends history with a new version") {
    val h = Scd2.buildHistory(feed, Seq("k"), "ts", "id")
    val delta = Seq((2L, 21L, "2024-03-01 00:00:00", "upd"))
      .toDF("k", "id", "ts_s", "payload")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val h2 = Scd2.applyDelta(h, delta, Seq("k"), "ts", "id")
    val k2 = h2.where($"k" === 2).orderBy("id")
      .select($"id", $"current_flag").as[(Long, Boolean)].collect().toSeq
    assert(k2 == Seq((20L, false), (21L, true)))
  }
}
