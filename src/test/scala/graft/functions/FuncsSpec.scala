package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuncsSpec extends SparkSpec {
  import spark.implicits._

  test("splitBucket: deterministic, in [0, 100), salt changes the assignment") {
    val ids = (0L until 500L).toDF("id")
    val b = ids.select($"id",
        Funcs.splitBucket($"id", "graft").as("b1"),
        Funcs.splitBucket($"id", "graft").as("b2"),
        Funcs.splitBucket($"id", "other").as("b3"))
      .as[(Long, Long, Long, Long)].collect()
    assert(b.forall { case (_, b1, b2, _) => b1 == b2 })      // reproducible
    assert(b.forall { case (_, b1, _, _) => b1 >= 0 && b1 < 100 })
    assert(b.exists { case (_, b1, _, b3) => b1 != b3 })      // salt matters
    // roughly uniform: each decile sees something
    val byDecile = b.groupBy(_._2 / 10).view.mapValues(_.size).toMap
    assert(byDecile.size == 10)
  }

  test("splitLabel boundaries: 80/10/10 with exact cutoffs") {
    val labels = Seq(0L, 79L, 80L, 89L, 90L, 99L).toDF("b")
      .select($"b", Funcs.splitLabel($"b").as("l")).as[(Long, String)]
      .collect().toMap
    assert(labels == Map(0L -> "train", 79L -> "train", 80L -> "val",
      89L -> "val", 90L -> "test", 99L -> "test"))
  }

  test("hashMod rejects n outside the 6-digit draw space") {
    intercept[IllegalArgumentException](Funcs.hashMod($"id", "s", 0))
    intercept[IllegalArgumentException](Funcs.hashMod($"id", "s", 1000001))
    // the max legal n still yields in-range shards
    val max = Seq(1L, 2L, 3L).toDF("id")
      .select(Funcs.hashMod($"id", "s", 1000000).as("h")).as[Long].collect()
    assert(max.forall(h => h >= 0 && h < 1000000))
  }
}
