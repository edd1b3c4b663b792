package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces exactly the plain-join result on skewed keys") {
    // 90% of the large side sits on key 1 (the pathological shape)
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else (i % 7).toLong, i))
      .toDF("k", "payload")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"),
      (4L, "four"), (5L, "five"), (6L, "six")).toDF("k", "name")

    val plain = large.join(small, "k")
    val salted = Skew.saltedJoin(large, small, "k", buckets = 8)

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}
