package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the naive theta join, including boundary semantics") {
    val points = (0 until 200).map { i =>
      (i.toLong, s"2024-01-${i % 28 + 1} ${i % 24}:30:00")
    }.toDF("pid", "ts_s").withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    // overlapping 2-day intervals starting every day
    val intervals = (1 to 27).map { d =>
      (d.toLong, f"2024-01-$d%02d 00:00:00", f"2024-01-${d + 2}%02d 00:00:00")
    }.toDF("iid", "s_s", "e_s")
      .withColumn("start_ts", $"s_s".cast("timestamp"))
      .withColumn("end_ts", $"e_s".cast("timestamp"))
      .drop("s_s", "e_s")

    val naive = points.join(intervals,
        $"ts" >= $"start_ts" && $"ts" < $"end_ts")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val fast = RangeJoin.pointInInterval(points, intervals,
        "ts", "start_ts", "end_ts", bucketWidth = 86400L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
    // interior points match both overlapping intervals
    assert(fast.groupBy(_._1).values.exists(_.size == 2))
  }

  test("pointInInterval with equality keys joins only within the key") {
    val points = Seq((1L, "a", "2024-01-01 05:00:00"), (2L, "b", "2024-01-01 05:00:00"))
      .toDF("pid", "k", "ts_s").withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val intervals = Seq(("a", 10L, "2024-01-01 00:00:00", "2024-01-02 00:00:00"))
      .toDF("k", "iid", "s_s", "e_s")
      .withColumn("start_ts", $"s_s".cast("timestamp"))
      .withColumn("end_ts", $"e_s".cast("timestamp")).drop("s_s", "e_s")
    val out = RangeJoin.pointInInterval(points, intervals,
        "ts", "start_ts", "end_ts", keyCols = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L)))
  }
}
