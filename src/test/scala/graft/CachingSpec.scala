package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class CachingSpec extends SparkSpec {
  import spark.implicits._

  // suites share one JVM-wide session and earlier suites may leave
  // their own persisted frames behind — all assertions are on the
  // DELTA of persistent RDDs, never on the absolute set
  private def persisted: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("operator-internal persists are tracked and released by unpersistAll") {
    Caching.unpersistAll(blocking = true) // release any tracked leftovers
    val before = persisted
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different document about spark")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")

    val out = Dedup.ngramJaccard(pairs, docs, "text", "doc_id")
    assert(out.count() == 1) // the consuming action populates the cache
    assert((persisted -- before).nonEmpty,
      "ngramJaccard's internal shingle expansion should be persisted")

    val released = Caching.unpersistAll(blocking = true)
    assert(released >= 1)
    assert(persisted == before,
      "unpersistAll must release every operator-internal cache")
    // idempotent: a second call has nothing left to release
    assert(Caching.unpersistAll() == 0)
  }

  test("unpersistAll leaves caller-owned caches alone") {
    Caching.unpersistAll(blocking = true)
    val before = persisted
    val mine = (1L to 10L).toDF("x").persist()
    mine.count()
    val withMine = persisted
    assert((withMine -- before).nonEmpty)
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    Dedup.ngramJaccard(Seq((1L, 2L)).toDF("id_a", "id_b"), docs, "text", "doc_id").count()
    Caching.unpersistAll(blocking = true)
    assert(persisted == withMine,
      "the caller's own persisted frame must survive unpersistAll")
    mine.unpersist(blocking = true)
    assert(persisted == before)
  }

  test("scoped persists are isolated: unpersistAll leaves them; the scope's owner releases them") {
    Caching.unpersistAll(blocking = true)
    val before = persisted
    // distinct text per query: identical plans would collapse to ONE
    // cache-manager entry and the isolation assertion would test the
    // cache manager's dedup, not the scopes
    def buildQuery(tag: String) = {
      val docs = Seq((1L, s"a b c d $tag"), (2L, s"a b c d $tag")).toDF("doc_id", "text")
      Dedup.ngramJaccard(Seq((1L, 2L)).toDF("id_a", "id_b"), docs, "text", "doc_id")
    }
    // one query built inside a scope, another outside (global)
    val (scopedQ, scope) = Caching.scoped(buildQuery("scoped"))
    val globalQ = buildQuery("global")
    assert(scopedQ.count() == 1 && globalQ.count() == 1)
    assert((persisted -- before).nonEmpty)

    // releasing the GLOBAL scope must not touch the scoped query's
    // caches (the other-in-flight-query isolation)
    Caching.unpersistAll(blocking = true)
    assert((persisted -- before).nonEmpty,
      "scoped caches must survive unpersistAll")
    assert(scopedQ.count() == 1) // still answers (from cache or lineage)

    assert(scope.release(blocking = true) >= 1)
    assert(persisted == before, "scope.release must clear exactly its own")
    assert(scope.release() == 0) // idempotent

    // after the scoped block, registration falls back to global
    val lateQ = buildQuery("late")
    assert(lateQ.count() == 1)
    assert(Caching.unpersistAll(blocking = true) >= 1)
    assert(persisted == before)
  }
}
