package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives under any partitioning; false-positive rate is sane") {
    val keys = (1L to 2000L).map(_ * 7L)
    for (parts <- Seq(1, 8)) {
      val small = keys.toDF("k").repartition(parts)
      val bits = Bloom.build(small, "k", numBits = 1 << 15, numHashes = 4)

      // every inserted key must test positive (zero false negatives)
      val inserted = small.where(Bloom.mightContain($"k", bits)).count()
      assert(inserted == keys.size.toLong, s"parts=$parts dropped inserted keys")

      // non-members: fp rate should be near (1-e^{-kn/m})^k ≈ 0.7% here
      val probes = (1L to 20000L).map(_ * 7L + 3L).toDF("k") // disjoint from keys
      val fp = probes.where(Bloom.mightContain($"k", bits)).count()
      assert(fp < 20000L * 5 / 100, s"parts=$parts fp=$fp too high")
    }
  }

  test("bloomSemiJoin result is exactly the plain semi-join") {
    val large = (1L to 5000L).map(k => (k, s"row$k")).toDF("k", "payload")
    val small = (1L to 5000L).filter(_ % 37 == 0).map(k => k).toDF("sk")
    val got = Bloom.bloomSemiJoin(large, small, "k", "sk", numBits = 1 << 12)
      .as[(Long, String)].collect().toSet
    val expect = large.join(small.select($"sk".as("k")), Seq("k"), "left_semi")
      .as[(Long, String)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("bitsets merge by OR (buffers are associative across partitions)") {
    val a = Bloom.build((1L to 100L).toDF("k").repartition(1), "k", numBits = 1 << 10)
    val b = Bloom.build((1L to 100L).toDF("k").repartition(7), "k", numBits = 1 << 10)
    assert(a == b)
  }
}
