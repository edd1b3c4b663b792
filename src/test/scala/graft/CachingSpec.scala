package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class CachingSpec extends SparkSpec {
  import spark.implicits._

  test("operator-internal persists are tracked and released by unpersistAll") {
    Caching.unpersistAll(blocking = true) // clean slate
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different document about spark")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")

    val out = Dedup.ngramJaccard(pairs, docs, "text", "doc_id")
    assert(out.count() == 1) // the consuming action populates the cache
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "ngramJaccard's internal shingle expansion should be persisted")

    val released = Caching.unpersistAll(blocking = true)
    assert(released >= 1)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "unpersistAll must release every operator-internal cache")
    // idempotent: a second call has nothing left to release
    assert(Caching.unpersistAll() == 0)
  }

  test("unpersistAll leaves caller-owned caches alone") {
    Caching.unpersistAll(blocking = true)
    val mine = (1L to 10L).toDF("x").persist()
    mine.count()
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    Dedup.ngramJaccard(Seq((1L, 2L)).toDF("id_a", "id_b"), docs, "text", "doc_id").count()
    Caching.unpersistAll(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the caller's own persisted frame must survive unpersistAll")
    mine.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
