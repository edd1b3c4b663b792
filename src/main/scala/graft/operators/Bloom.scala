package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtering for selective joins — the runtime-filter
  * pattern (Spark's own InjectRuntimeFilter / Snowflake's join
  * pruning) as an explicit operator:
  *
  *  1. one distributed aggregate builds a bitset over the SMALL side's
  *     join keys (O(bits) state, bitwise-OR merge — embarrassingly
  *     mergeable);
  *  2. the bitset ships to every task as a literal (metadata-sized —
  *     the same transport as a broadcast var, but visible to codegen);
  *  3. the LARGE side is pre-filtered by pure bit-test expressions
  *     BEFORE it reaches the join shuffle — at 100 TB this is the
  *     difference between shuffling the full fact table and shuffling
  *     the ~matching fraction.
  *
  * False positives pass the pre-filter and are removed by the exact
  * join that follows; false negatives are impossible (spec-proven), so
  * `bloom-prefilter + join ≡ join` — which makes the composition
  * SQL-oracle-able.
  *
  * Hashes are double-hashing over two universal (a·x+b mod p) draws —
  * modular arithmetic only, so ANSI mode can never overflow and the
  * Scala (build) and Column (probe) sides compute bit-identical
  * positions.
  */
object Bloom {

  val P: Long = 2147483647L // 2^31 - 1 (Mersenne)

  /** Deterministic (a,b) pairs for the two base hashes. */
  private def params(seed: Long): ((Long, Long), (Long, Long)) = {
    val rnd = new scala.util.Random(seed)
    def draw() = (rnd.nextInt((P - 1).toInt).toLong + 1L, rnd.nextInt(P.toInt).toLong)
    (draw(), draw())
  }

  /** Bit positions of `key` (double hashing: g_i = h1 + i·h2 mod bits). */
  private def positions(key: Long, numBits: Int, numHashes: Int, seed: Long): Seq[Int] = {
    val ((a1, b1), (a2, b2)) = params(seed)
    val x = ((key % P) + P) % P
    val h1 = (a1 * x + b1) % P
    val h2 = (a2 * x + b2) % P
    (0 until numHashes).map(i => (((h1 + i * h2) % P) % numBits).toInt)
  }

  /** Typed Aggregator building the bitset (Seq[Long] words). */
  final class BloomAgg[IN](numBits: Int, numHashes: Int, seed: Long, key: IN => Long)
    extends Aggregator[IN, Array[Long], Seq[Long]] {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")

    override def zero: Array[Long] = new Array[Long](numBits / 64)

    override def reduce(b: Array[Long], in: IN): Array[Long] = {
      positions(key(in), numBits, numHashes, seed)
        .foreach(p => b(p >> 6) |= (1L << (p & 63)))
      b
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }

    override def finish(b: Array[Long]): Seq[Long] = b.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Build the bitset over `keyCol` of `small` (collects ONE row of
    * numBits/64 longs — metadata, not data).
    */
  def build(small: DataFrame, keyCol: String,
            numBits: Int = 1 << 16, numHashes: Int = 4,
            seed: Long = 97L): Seq[Long] = {
    val spark = small.sparkSession
    import spark.implicits._
    // null keys can never match an (equi-)semi-join, so they don't
    // belong in the filter — and a null would fail the non-nullable
    // Long decode below at runtime
    small.where(col(keyCol).isNotNull)
      .select(col(keyCol).cast("long")).as[Long]
      .select(new BloomAgg[Long](numBits, numHashes, seed, identity).toColumn)
      .head()
  }

  /** Membership test as a pure Column expression over the literal
    * bitset — stays inside whole-stage codegen; same double-hashing
    * arithmetic as the build side.
    */
  def mightContain(keyCol: Column, bits: Seq[Long],
                   numHashes: Int = 4, seed: Long = 97L): Column = {
    val numBits = bits.length * 64
    val ((a1, b1), (a2, b2)) = params(seed)
    val words = typedLit(bits)
    val x = pmod(keyCol.cast("long"), lit(P))
    val h1 = (lit(a1) * x + lit(b1)) % P
    val h2 = (lit(a2) * x + lit(b2)) % P
    (0 until numHashes).map { i =>
      val p = ((h1 + lit(i.toLong) * h2) % P) % numBits
      // element_at is 1-based; test bit (p mod 64) of word (p div 64).
      // floor(p/64) is exact: p < 2^31 fits a double losslessly.
      call_function("shiftright", element_at(words, floor(p / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(1) === 1
    }.reduce(_ && _)
  }

  /** Semi-join `large` to `small` on equal key columns, pre-filtered
    * by the bloom BEFORE the join shuffle. Result is exactly
    * `large semi-join small` (the exact join removes false positives).
    */
  def bloomSemiJoin(large: DataFrame, small: DataFrame,
                    largeKey: String, smallKey: String,
                    numBits: Int = 1 << 16, numHashes: Int = 4,
                    seed: Long = 97L): DataFrame = {
    val bits = build(small, smallKey, numBits, numHashes, seed)
    large.where(mightContain(col(largeKey), bits, numHashes, seed))
      .join(small.select(col(smallKey).as(largeKey)), Seq(largeKey), "left_semi")
  }
}
