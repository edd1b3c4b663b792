package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with / aggregate) — no UDFs.
  *
  * Exactness contract: elements are quantized to decimal(12,6) and
  * accumulated in decimal, which is associative and engine-exact, so
  * a DuckDB oracle computing the same sum in ANY order gets the same
  * rational number; only then do we drop to double (IEEE ops on
  * identical inputs are deterministic). This keeps cosine comparable
  * across engines to ~1 ulp instead of float-summation-order noise.
  */
object VecFuncs {

  private val Acc = "decimal(32,12)"

  /** Exact decimal dot product of two float-array columns. */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("decimal(12,6)") * y.cast("decimal(12,6)")),
      lit(0).cast(Acc),
      (acc, v) => (acc + v).cast(Acc))

  /** Exact decimal squared L2 norm. */
  def normSqDec(a: Column): Column = dotDec(a, a)

  /** Cosine similarity as double, via the exact-decimal intermediates. */
  def cosine(a: Column, b: Column): Column =
    dotDec(a, b).cast("double") /
      sqrt(normSqDec(a).cast("double") * normSqDec(b).cast("double"))

  /** Plain double dot product (internal use — fast path, not meant for
    * cross-engine comparison).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
}
