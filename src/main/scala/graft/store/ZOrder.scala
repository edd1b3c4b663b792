package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering codes — multi-column data skipping for
  * [[SnapshotStore.compact]].
  *
  * `compact(clusterBy = ...)` sorts lexicographically, which gives
  * tight per-file/row-group ranges for the LEADING column only: every
  * file spans the full range of the second column, so predicates on it
  * prune nothing. Interleaving the bits of per-column QUANTILE-bucket
  * codes instead makes nearby code values nearby in every clustered
  * dimension at once — each written file covers a small hyper-rectangle,
  * so the per-file min/max recorded in the manifest stays narrow for
  * ALL z-columns and [[SnapshotStore.readRange]] prunes files on any of
  * them (the reference's warehouse gets the same effect from Snowflake
  * clustering keys over micro-partitions, e.g. the date+location MERGE
  * predicates in `/root/reference/with procedures/order_proc.sql`).
  *
  * Bucketing is by quantiles, not min/max normalization, so skew cannot
  * collapse the code space: boundaries come from ONE distributed
  * `approxQuantile` pass (Greenwald-Khanna partials, driver receives
  * only `cols × 2^bits` doubles). The code column is pure built-in
  * arithmetic (comparisons, shifts, ors) — codegen-friendly, no UDF.
  *
  * Layout-only contract: the z-code orders rows but never changes
  * them. Approximations (string prefix projection, clamped code
  * points, double-rounded quantiles) can only cost pruning efficiency,
  * never correctness — reads always apply the exact predicate after
  * pruning.
  */
object ZOrder {

  /** Order-preserving numeric projection of a column (what quantile
    * bucketing runs on). Strings project 6 characters starting AFTER
    * the column-wide common prefix (`skip`) as a base-256 integer —
    * exact in a double's 53-bit mantissa; a URL- or key-style column
    * whose values all share a literal prefix would otherwise project
    * to near-identical numbers and collapse the code space. Code
    * points above 255 clamp, so ordering beyond ASCII is approximate —
    * see the layout-only contract above.
    */
  private def projection(df: DataFrame, c: String, skip: Int): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c)).cast("double")
      case DateType => unix_date(col(c)).cast("double")
      case BooleanType => col(c).cast("int").cast("double")
      case StringType =>
        (0 until 6).map { i =>
          least(coalesce(ascii(substring(col(c), skip + i + 1, 1)), lit(0)), lit(255))
            .cast("double") * math.pow(256.0, 5 - i)
        }.reduce(_ + _)
      case _: NumericType => col(c).cast("double")
      case other => throw new IllegalArgumentException(
        s"z-order column $c: unsupported type $other")
    }

  /** Per string column, the length of the prefix ALL its values share
    * (computed from the column min/max alone — sharing a prefix with
    * both extremes implies sharing it with everything between). One
    * metadata-sized agg for all string columns together.
    */
  private def commonPrefixLens(df: DataFrame, cols: Seq[String]): Map[String, Int] = {
    val strCols = cols.filter(c => df.schema(c).dataType == StringType)
    if (strCols.isEmpty) return Map.empty
    val aggs = strCols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    strCols.zipWithIndex.map { case (c, i) =>
      val len = (Option(row.getString(2 * i)), Option(row.getString(2 * i + 1))) match {
        case (Some(a), Some(b)) => a.zip(b).takeWhile { case (x, y) => x == y }.length
        case _ => 0
      }
      c -> len
    }.toMap
  }

  /** The Morton code column for `cols`, with `bits` bits per column.
    * Runs one `approxQuantile` action over `df` to place the bucket
    * boundaries, then returns a pure expression: per-column bucket
    * index (count of boundaries ≤ value, a `filter` HOF over a literal
    * boundary array) bit-interleaved into one long. Nulls sort first
    * (bucket 0). Result is deterministic for a given `df`.
    */
  def code(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits=$bits over ${cols.size} columns exceeds a long")
    val nBuckets = 1 << bits
    val skips = commonPrefixLens(df, cols)
    val tmp = cols.indices.map(i => s"__z_$i")
    val projected = df.select(cols.zip(tmp).map { case (c, n) =>
      projection(df, c, skips.getOrElse(c, 0)).as(n)
    }: _*)
    val probs = (0 until nBuckets).map(_.toDouble / nBuckets).toArray
    // relativeError 1/(4·buckets): boundary placement error is a
    // fraction of one bucket's mass — cheap, single pass, mergeable.
    // probs start at 0 so bounds(_)(0) is (approximately) the column
    // min: boundaries at the min separate nothing and only offset
    // every code, so they are dropped
    val bounds = projected.stat.approxQuantile(tmp.toArray, probs, 0.25 / nBuckets)
    val codes = cols.zip(bounds).map { case (c, bs) =>
      val colMin = bs.headOption.getOrElse(Double.NaN)
      val distinct = bs.drop(1).distinct.sorted.dropWhile(_ <= colMin)
      if (distinct.isEmpty) lit(0L) // all-null, constant, or empty column
      else {
        val v = projection(df, c, skips.getOrElse(c, 0))
        when(v.isNull, lit(0L)).otherwise(
          size(filter(lit(distinct), b => v >= b)).cast("long"))
      }
    }
    val interleaved = for {
      bit <- 0 until bits
      i <- codes.indices
    } yield shiftleft(shiftright(codes(i), bit).bitwiseAND(lit(1L)),
      bit * codes.size + i)
    interleaved.reduce(_ bitwiseOR _)
  }
}
