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

    private def insert(buf: KmvBuf, h: Long): KmvBuf =
      if (buf.mins.length >= buf.k && h >= buf.mins.last) buf
      else if (buf.mins.contains(h)) buf
      else KmvBuf(buf.k, (buf.mins :+ h).sorted.take(buf.k))

    override def reduce(b: KmvBuf, in: IN): KmvBuf =
      insert(b, scrambled(key(in)))

    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf =
      KmvBuf(x.k, (x.mins ++ y.mins).distinct.sorted.take(x.k))

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
}
