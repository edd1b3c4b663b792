package graft.operators

import graft.SparkSpec

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("KMV is exact below k and within ~10% above it; deterministic across runs") {
    // 3 groups: 100, 2000, 10000 distinct keys (with duplicates mixed in)
    val rows =
      (1 to 100).map(i => ("small", i.toLong)) ++
      (1 to 2000).flatMap(i => Seq(("mid", i.toLong), ("mid", i.toLong))) ++
      (1 to 10000).map(i => ("big", i.toLong))
    val df = rows.toDF("grp", "key")

    val est1 = Sketch.kmvDistinct(df, "grp", "key", k = 256)
      .as[(String, Long)].collect().toMap
    val est2 = Sketch.kmvDistinct(df, "grp", "key", k = 256)
      .as[(String, Long)].collect().toMap
    assert(est1 == est2) // deterministic

    assert(est1("small") == 100L) // below k → exact
    assert(math.abs(est1("mid") - 2000.0) / 2000.0 < 0.15)
    assert(math.abs(est1("big") - 10000.0) / 10000.0 < 0.15)
  }

  test("KMV buffers merge associatively (partition boundaries don't change the result)") {
    val df1 = (1 to 5000).map(i => ("g", i.toLong)).toDF("grp", "key").repartition(1)
    val df8 = (1 to 5000).map(i => ("g", i.toLong)).toDF("grp", "key").repartition(8)
    val e1 = Sketch.kmvDistinct(df1, "grp", "key").as[(String, Long)].head()._2
    val e8 = Sketch.kmvDistinct(df8, "grp", "key").as[(String, Long)].head()._2
    assert(e1 == e8)
  }
}
