package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim toy corpus with known geometry
  private def emb = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)),   // closest to 0
    (2L, Array(0.5f, 0.5f, 0f, 0f)),   // second
    (3L, Array(0f, 1f, 0f, 0f)),       // orthogonal
    (4L, Array(-1f, 0f, 0f, 0f))       // opposite
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    val out = Similarity.bruteForceTopK(emb, emb.where($"vec_id" === 0),
        "vec_id", "embedding", k = 4)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("lshTopK: identical direction lands in the same bucket and ranks first") {
    val corpus = Seq(
      (0L, Array.fill(64)(0.5f)),
      (1L, Array.fill(64)(0.49f)),          // same direction → same signs
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(corpus, corpus.where($"vec_id" === 0),
        "vec_id", "embedding", k = 5)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.headOption.contains((1L, 1L)))
    // vector 2 differs in roughly half its signs → almost surely another bucket
    assert(!out.map(_._2).contains(2L))
  }

  test("lshTopK agrees with bruteForceTopK on its candidate set (rerank is exact)") {
    val q = emb.where($"vec_id" === 0)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 4)
      .select("neighbor_id", "cos_e3").as[(Long, Long)].collect().toMap
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", 4, numPlanes = 4, dim = 4)
      .select("neighbor_id", "cos_e3").as[(Long, Long)].collect().toMap
    lsh.foreach { case (id, ce3) => assert(brute(id) == ce3) }
  }
}
