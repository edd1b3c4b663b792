package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tsc(s: String) = s // cast below

  test("leftAsOf picks the latest build row at or before each probe ts") {
    val probe = Seq(
      (1L, 100L, "2024-01-05 00:00:00"),
      (2L, 100L, "2024-01-15 00:00:00"),
      (3L, 100L, "2024-01-10 00:00:00"), // exactly at a build ts → matches it
      (4L, 200L, "2024-01-01 00:00:00"), // before any build row → null
      (5L, 300L, "2024-06-01 00:00:00")  // key with no build rows → null
    ).toDF("pid", "k", "pts_s").withColumn("pts", $"pts_s".cast("timestamp")).drop("pts_s")
    val build = Seq(
      (10L, 100L, "2024-01-01 00:00:00", "a"),
      (11L, 100L, "2024-01-10 00:00:00", "b"),
      (12L, 100L, "2024-01-20 00:00:00", "c"),
      (20L, 200L, "2024-02-01 00:00:00", "z")
    ).toDF("bid", "k", "bts_s", "v").withColumn("bts", $"bts_s".cast("timestamp")).drop("bts_s")

    val out = AsOfJoin.leftAsOf(probe, build, "k", "k", "pts", "bts",
        Seq("bid", "v"), tiebreak = "bid")
      .select($"pid", $"asof_bid", $"asof_v")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some("a")),
      (2L, Some(11L), Some("b")),
      (3L, Some(11L), Some("b")),  // <= semantics: build at equal ts matches
      (4L, None, None),
      (5L, None, None)))
  }

  test("leftAsOf resolves equal-ts build ties to the greatest tiebreak, as one struct") {
    val probe = Seq((1L, 9L, "2024-01-02 00:00:00"))
      .toDF("pid", "k", "pts_s").withColumn("pts", $"pts_s".cast("timestamp")).drop("pts_s")
    val build = Seq(
      (5L, 9L, "2024-01-01 00:00:00", Option("early")),
      (7L, 9L, "2024-01-01 00:00:00", Option.empty[String]) // winner has null payload col
    ).toDF("bid", "k", "bts_s", "v").withColumn("bts", $"bts_s".cast("timestamp")).drop("bts_s")
    val out = AsOfJoin.leftAsOf(probe, build, "k", "k", "pts", "bts",
        Seq("bid", "v"), tiebreak = "bid")
      .select($"asof_bid", $"asof_v").as[(Option[Long], Option[String])].collect()
    // the whole winning row (bid=7) is carried — not a per-column mix
    assert(out.toSeq == Seq((Some(7L), None)))
  }
}
