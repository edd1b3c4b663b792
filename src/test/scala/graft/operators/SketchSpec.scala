package graft.operators

import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct}

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

  // Zipf-ish skewed stream: item i appears ~N/i times → a few heavy
  // items over a long tail, the regime MG exists for.
  private def skewed(n: Int): Seq[(String, String)] =
    (1 to n).flatMap(i => Seq.fill(n / i)(("g", s"item$i")))

  test("Misra-Gries sketch contains every item above the n/(k+1) threshold, under any partitioning") {
    val rows = skewed(200)
    val n = rows.size.toLong
    val k = 20
    val exact = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val mustHave = exact.collect { case (it, c) if c * (k + 1) > n => it }.toSet

    for (parts <- Seq(1, 3, 8)) {
      val df = rows.toDF("grp", "item").repartition(parts)
      val sketch = df.as[(String, String)]
        .groupByKey(_._1)
        .agg(new Sketch.FreqItems[(String, String)](k, _._2).toColumn.name("s"))
        .collect().head._2.items
      assert(sketch.size <= k)
      assert(mustHave.subsetOf(sketch.keySet),
        s"parts=$parts missing ${mustHave.diff(sketch.keySet)}")
      // estimates never exceed true counts
      sketch.foreach { case (it, est) => assert(est <= exact(it)) }
    }
  }

  test("heavyHitters (sketch-then-verify) is EXACT: equals the full groupBy computation") {
    val df = skewed(500).toDF("grp", "item").repartition(7)
    val phi = 40L
    val got = Sketch.heavyHitters(df, "grp", "item", phiDenom = phi, k = 64)
      .as[(String, String, Long, Long)].collect().toSet
    val n = df.count()
    val expect = skewed(500).groupBy(_._2).view.mapValues(_.size.toLong)
      .collect { case (it, c) if c * phi > n => ("g", it, c, n) }.toSet
    assert(got == expect)
  }

  test("k04 approx_count_distinct: bounded error vs exact, partition-invariant") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, dir)
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val approx = graft.QueriesData.k04(spark, dir)
      .select($"event_type", $"approx_users")
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (g, a) =>
      val e = exact(g).toDouble
      assert(math.abs(a - e) / e <= 0.10, s"group $g: approx $a vs exact $e")
    }
    // the sketch merge is commutative — partition layout cannot change
    // the estimate
    val repart = events.repartition(13).groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("approx_users"))
      .as[(String, Long)].collect().toMap
    assert(repart == approx)
  }
}
