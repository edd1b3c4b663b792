package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 1000L).map(i => (i, (i % 50) + 1L)).toDF("id", "w")

  test("weightedSample: exact size, deterministic, partition-invariant") {
    val a = Sampling.weightedSample(corpus.repartition(1), "id", "w", k = 100)
      .as[(Long, Long)].collect().toSet
    val b = Sampling.weightedSample(corpus.repartition(8), "id", "w", k = 100)
      .as[(Long, Long)].collect().toSet
    assert(a.size == 100)
    assert(a == b) // pure function of (ids, weights, seed)
  }

  test("weight scale-invariance: multiplying all weights by c preserves the sample") {
    val base = Sampling.weightedSample(corpus, "id", "w", k = 50)
      .as[(Long, Long)].collect().map(_._1).toSet
    val scaled = Sampling.weightedSample(
        corpus.select($"id", ($"w" * 1000L).as("w")), "id", "w", k = 50)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(base == scaled) // u^(1/cw) is monotone in u^(1/w)
  }

  test("zero-weight rows are never sampled; heavier rows win more often") {
    val df = (1L to 100L).map(i => (i, if (i <= 50) 0L else 100L)).toDF("id", "w")
    val s = Sampling.weightedSample(df, "id", "w", k = 50)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(s == (51L to 100L).toSet) // only positive-weight rows

    // 10 heavy ids (w=1000) vs 90 light (w=1): heavy dominate a k=10 draw
    val skew = (1L to 100L).map(i => (i, if (i <= 10) 1000L else 1L)).toDF("id", "w")
    val top = Sampling.weightedSample(skew, "id", "w", k = 10)
      .as[(Long, Long)].collect().count(_._1 <= 10L)
    assert(top >= 8, s"expected heavy items to dominate, got $top/10")
  }

  test("domain mix (t13): acceptance rates follow the target weights; sampling is the bucket threshold exactly") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
    val got = graft.QueriesData.t13(spark, dir)
      .select("doc_id", "source", "n_source", "weight", "accept_pct",
        "mix_bucket", "sampled")
      .as[(Long, String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    // sampled ⟺ bucket below the source's acceptance threshold
    got.foreach { case (id, _, _, _, pct, bucket, sampled) =>
      assert(sampled == (bucket < pct), s"doc $id flag mismatch")
    }
    // per-source rate = min(1, target_share·total / n_source), in pct
    val perSource = got.groupBy(_._2).map { case (src, rows) =>
      (src, rows.head._3, rows.head._4, rows.head._5)
    }.toSeq
    val total = perSource.map(_._2).sum
    val sumW = perSource.map(_._3).sum
    perSource.foreach { case (src, n, w, pct) =>
      val expect = math.min(100L, math.floor(100.0 * w * total / (sumW * n)).toLong)
      assert(pct == expect, s"source $src acceptance $pct != $expect")
      assert(w == src.stripPrefix("src").toLong % 5 + 1)
    }
    // the fixture exercises both capped and fractional rates
    assert(perSource.exists(_._4 == 100L) && perSource.exists(_._4 < 100L))
  }
}
