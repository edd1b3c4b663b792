package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with / aggregate) — no UDFs.
  *
  * Exactness contract: elements are quantized to integer 1e-6 units
  * (`round(x * 1e6)` — the float is widened to double exactly, the
  * product is a single IEEE op, and both Spark and DuckDB round
  * halves away from zero) and accumulated in int64, which is exact
  * and order-independent: an oracle computing the same sum in ANY
  * order gets the same integer. Only then do we drop to double (IEEE
  * ops on identical inputs are deterministic), so cosine is
  * bit-comparable across engines. Magnitudes: |x|≤~10³ → e6 products
  * ≤1e18/dim at dim 64 stays far inside int64.
  */
object VecFuncs {

  private def e6(x: Column): Column = round(x * 1000000d).cast("long")

  /** Exact integer dot product in 1e-12 units. */
  def dotE12(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => e6(x) * e6(y)), lit(0L), (acc, v) => acc + v)

  /** Exact integer squared L2 norm in 1e-12 units. */
  def normSqE12(a: Column): Column = dotE12(a, a)

  /** Cosine similarity as double, via the exact-integer intermediates. */
  def cosine(a: Column, b: Column): Column =
    dotE12(a, b).cast("double") /
      sqrt(normSqE12(a).cast("double") * normSqE12(b).cast("double"))

  /** Plain double dot product (internal fast path — not meant for
    * cross-engine comparison).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  // -- native (codegen'd) forms: identical values to the HOF forms --
  // Require graft.GraftFunctions.register(spark) (idempotent) or the
  // GraftExtensions session extension.

  def dotE12Native(a: Column, b: Column): Column =
    call_function("graft_dot_e12", a, b)

  def normSqE12Native(a: Column): Column =
    call_function("graft_dot_e12", a, a)

  def cosineNative(a: Column, b: Column): Column =
    dotE12Native(a, b).cast("double") /
      sqrt(normSqE12Native(a).cast("double") * normSqE12Native(b).cast("double"))
}
