package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Owned lifecycle for the persists graft operators create internally.
  *
  * Several operators ([[operators.Dedup.ngramJaccard]],
  * [[operators.Similarity.lshTopK]],
  * [[operators.Dedup.embeddingNearDupsLsh]], q36) materialize a small
  * intermediate frame that their returned plan references more than
  * once (AQE's broadcast conversion can break ReuseExchange subtree
  * identity, re-running the whole signature pipeline per reference).
  * Because the operator returns a LAZY frame, it cannot unpersist
  * before the caller's action — so every internal persist is
  * registered here, and callers release them all with ONE call:
  *
  * {{{
  *   val out = Dedup.ngramJaccard(pairs, docs, "text", "doc_id")
  *   out.write.parquet(...)      // the action that uses the caches
  *   Caching.unpersistAll()      // release graft's internal caches
  * }}}
  *
  * Unlike `spark.catalog.clearCache()` (what the Verify/Bench
  * harnesses use between queries), this releases ONLY graft-created
  * caches and leaves the caller's own persisted frames alone.
  *
  * Scope caveat: the registry is PROCESS-GLOBAL, like the session
  * cache it manages. `unpersistAll()` releases every tracked frame,
  * including ones another thread's in-flight query still references
  * (that query recomputes from lineage — correct, just slower), so
  * call it at quiescent points: between queries, or at the end of a
  * job. Callers that never call it keep every tracked frame cached
  * for the session's lifetime — the documented trade for operators
  * whose returned LAZY plans cannot release their own intermediates.
  */
object Caching {

  private val tracked = mutable.Set.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for
    * [[unpersistAll]]. All internal operator persists go through here.
    */
  def persistTracked(df: DataFrame,
                     level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      tracked += df
      df.persist(level)
    }

  /** Unpersist every frame registered since the last call; returns how
    * many were released. Safe to call at any time — frames already
    * unpersisted (e.g. by `clearCache`) unpersist as a no-op.
    */
  def unpersistAll(blocking: Boolean = false): Int = synchronized {
    val n = tracked.size
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
    n
  }
}
