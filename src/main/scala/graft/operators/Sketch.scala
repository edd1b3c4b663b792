package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed sketches for cardinality at scale.
  *
  * [[KmvDistinct]] is a K-Minimum-Values estimator implemented as a
  * typed `Aggregator`: each partition keeps only the k smallest
  * (uniform) hash values of its keys, buffers merge by k-way min-merge,
  * and the estimate is (k-1) / kth-smallest-normalized-hash. State is
  * O(k) per group regardless of input size — the custom-sketch shape
  * (KMV / bottom-k, Bar-Yossef et al. 2002; public algorithm) that
  * complements Spark's built-in HLL++ (`approx_count_distinct`).
  * Deterministic: xxhash64 with a fixed seed, no randomness.
  */
object Sketch {

  /** Bottom-k state: sorted ascending, at most k entries. */
  final case class KmvBuf(k: Int, mins: Seq[Long])

  final class KmvDistinct[IN](k: Int, key: IN => Long) extends Aggregator[IN, KmvBuf, Long] {

    override def zero: KmvBuf = KmvBuf(k, Vector.empty)

    /** First index whose value is ≥ h in the (sorted) buffer. */
    private def lowerBound(m: Seq[Long], h: Long): Int = {
      var lo = 0
      var hi = m.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (m(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }

    /** O(1) reject once saturated (the overwhelmingly common case);
      * accepted values use a binary-search positional insert instead
      * of the earlier contains + full re-sort (O(k log k) per accept).
      */
    private def insert(buf: KmvBuf, h: Long): KmvBuf = {
      val m = buf.mins
      if (m.length >= buf.k && h >= m.last) buf
      else {
        val i = lowerBound(m, h)
        if (i < m.length && m(i) == h) buf // already present
        else KmvBuf(buf.k, ((m.take(i) :+ h) ++ m.drop(i)).take(buf.k))
      }
    }

    override def reduce(b: KmvBuf, in: IN): KmvBuf =
      insert(b, scrambled(key(in)))

    /** Linear merge of two sorted buffers (both already deduped). */
    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var (i, j) = (0, 0)
      while (out.length < x.k && (i < x.mins.length || j < y.mins.length)) {
        val takeX = j >= y.mins.length ||
          (i < x.mins.length && x.mins(i) <= y.mins(j))
        val v = if (takeX) { val r = x.mins(i); i += 1; r }
                else { val r = y.mins(j); j += 1; r }
        if (out.isEmpty || out.last != v) out += v
      }
      KmvBuf(x.k, out.toVector)
    }

    override def finish(b: KmvBuf): Long =
      if (b.mins.length < b.k) b.mins.length.toLong
      else {
        // kth minimum as a fraction of the hash space → density → count
        val kth = b.mins.last.toDouble / Long.MaxValue // hashes masked positive
        math.round((b.k - 1) / kth)
      }

    /** xxhash64-style avalanche of the key into a positive long. */
    private def scrambled(key: Long): Long = {
      var h = key * -7046029254386353131L
      h ^= (h >>> 33); h *= -4417276706812531889L
      h ^= (h >>> 29); h *= 1609587929392839161L
      h ^= (h >>> 32)
      h & Long.MaxValue
    }

    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Per-group approximate distinct count of `keyCol` via KMV
    * (one string group column in this helper).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol), col(keyCol))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(new KmvDistinct[(String, Long)](k, _._2).toColumn.name("approx_distinct"))
      .toDF(groupCol, "approx_distinct")
  }

  // ------------------------------------------------------------------
  // Misra-Gries frequent items
  // ------------------------------------------------------------------

  /** MG state: at most k counters (wrapped for the product encoder). */
  final case class MgBuf(k: Int, counts: Map[String, Long])
  final case class MgOut(items: Map[String, Long])

  /** Misra-Gries heavy-hitter sketch as a typed `Aggregator`: O(k)
    * counters per group regardless of input size. The mergeable form
    * (Agarwal et al., "Mergeable Summaries", PODS 2012 — public
    * algorithm): counters add pointwise, then the (k+1)-th largest
    * count is subtracted from all and non-positive counters dropped.
    * Guarantee: true_freq − n/(k+1) ≤ est ≤ true_freq, so every item
    * with true_freq > n/(k+1) is present in the sketch — which makes a
    * sketch-then-exact-verify pipeline ([[heavyHitters]]) EXACT.
    */
  final class FreqItems[IN](k: Int, item: IN => String) extends Aggregator[IN, MgBuf, MgOut] {

    override def zero: MgBuf = MgBuf(k, Map.empty)

    /** Keep at most k counters: subtract the (k+1)-th largest count. */
    private def shrink(kk: Int, m: Map[String, Long]): Map[String, Long] =
      if (m.size <= kk) m
      else {
        val thresh = m.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(kk)
        m.collect { case (key, v) if v > thresh => key -> (v - thresh) }
      }

    override def reduce(b: MgBuf, in: IN): MgBuf = {
      val x = item(in)
      MgBuf(b.k, shrink(b.k, b.counts.updated(x, b.counts.getOrElse(x, 0L) + 1L)))
    }

    override def merge(x: MgBuf, y: MgBuf): MgBuf = {
      val summed = y.counts.foldLeft(x.counts) { case (acc, (key, v)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + v)
      }
      MgBuf(x.k max y.k, shrink(x.k max y.k, summed))
    }

    override def finish(b: MgBuf): MgOut = MgOut(b.counts)

    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[MgOut] = Encoders.product[MgOut]
  }

  /** EXACT per-group heavy hitters (items with freq·phiDenom > total)
    * via sketch-then-verify — the 100 TB shape for "top items" when
    * the item domain is too large to groupBy whole:
    *
    *  - pass 1: MG sketch per group (O(k) state, map-side partials,
    *    one shuffle of k-entry maps). With k ≥ phiDenom every item
    *    above the threshold is guaranteed to be in the candidate set.
    *  - pass 2: semi-join the (tiny, broadcast) candidate list back
    *    onto the stream and count ONLY candidate items exactly — the
    *    full-domain groupBy never happens.
    *
    * Output is exact (sketch only prunes), so a plain SQL oracle
    * verifies it.
    */
  def heavyHitters(df: DataFrame, groupCol: String, itemCol: String,
                   phiDenom: Long, k: Int): DataFrame = {
    require(k >= phiDenom, s"k=$k must be >= phiDenom=$phiDenom for the exactness guarantee")
    val spark = df.sparkSession
    import spark.implicits._
    val stream = df.select(col(groupCol).cast("string").as("__g"),
      col(itemCol).cast("string").as("__i"))
    // group totals ride along with the sketch pass (one typed agg, one
    // shuffle) — not a third scan of the stream. The candidate list is
    // tiny (≤ k rows per group) but its lineage is the whole sketch
    // pass, and it is referenced twice below (semi-join + totals join)
    // with a broadcast on each — persist so the stream is sketched once.
    val cands = stream.as[(String, String)]
      .groupByKey(_._1)
      .agg(new FreqItems[(String, String)](k, _._2).toColumn.name("sketch"),
        count(lit(1)).as[Long].name("total"))
      .toDF("__g", "sketch", "total")
      .select(col("__g"), col("total"),
        explode(map_keys(col("sketch.items"))).as("__i"))
      .transform(graft.Caching.persistTracked(_))
    stream.join(broadcast(cands.select("__g", "__i")), Seq("__g", "__i"), "left_semi")
      .groupBy(col("__g"), col("__i"))
      .agg(count(lit(1)).as("n_occurrences"))
      .join(broadcast(cands), Seq("__g", "__i"))
      .where(col("n_occurrences") * phiDenom > col("total"))
      .select(col("__g").as(groupCol), col("__i").as(itemCol),
        col("n_occurrences"), col("total").as("group_total"))
  }
}
