package graft.operators

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies I/U/D and drops unchanged rows") {
    val oldSnap = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "v")
    val newSnap = Seq((2L, "b", 20), (3L, "c", 99), (4L, "d", 40))
      .toDF("id", "name", "v")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, Seq("id"), Seq("name", "v"))
      .select("id", "action").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "D"), (3L, "U"), (4L, "I")))
  }

  test("snapshotDiff null-safe compare: null→value and value→null are updates") {
    val oldSnap = Seq((1L, Option("x")), (2L, Option.empty[String]), (3L, Option("z")))
      .toDF("id", "v")
    val newSnap = Seq((1L, Option.empty[String]), (2L, Option("y")), (3L, Option("z")))
      .toDF("id", "v")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, Seq("id"), Seq("v"))
      .select("id", "action").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "U"), (2L, "U")))
  }
}
