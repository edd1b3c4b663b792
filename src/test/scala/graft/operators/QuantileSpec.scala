package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** k03's contract: Spark's native GK approx_percentile with accuracy
  * `a` guarantees rank error ≤ n/a. The spec checks the guarantee
  * empirically against the EXACT sorted distribution — the same
  * exactness relationship q25 (exact percentiles) provides the slow
  * path for.
  */
class QuantileSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile rank error stays within the accuracy guarantee") {
    val n = 20000
    val rnd = new scala.util.Random(11)
    // skewed data: quantile estimation is hardest on heavy tails
    val values = Seq.fill(n)(math.exp(rnd.nextGaussian() * 2).toLong)
    val df = values.toDF("v")
    val accuracy = 1000 // guarantee: rank error ≤ n/accuracy = 20 ranks
    val pcts = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val est = df.agg(percentile_approx(col("v"), typedLit(pcts), lit(accuracy)))
      .head.getSeq[Long](0)
    val sorted = values.sorted.toIndexedSeq
    pcts.zip(est).foreach { case (p, e) =>
      // empirical rank of the estimate (any position among equal values)
      val lo = sorted.count(_ < e)
      val hi = sorted.count(_ <= e)
      val target = p * n
      val slack = n.toDouble / accuracy + 1
      assert(target >= lo - slack && target <= hi + slack,
        s"p=$p est=$e rank∈[$lo,$hi] target=$target slack=$slack")
    }
  }

  test("k03 query shape: one row per requested quantile, monotone estimates") {
    val out = graft.QueriesData.k03(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 10L, 25L, 50L, 75L, 90L, 99L))
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq) // monotone in p
    assert(out.forall(_._2 > 0))
  }
}
