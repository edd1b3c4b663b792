package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar helpers for the warehouse surface: surrogate keys, PII
  * masking, and code-mapping enrichment.
  *
  * Reference analogs: hash surrogate keys
  * (`/root/reference/02 Location Entity.sql:331` —
  * `hash(sha1_hex(concat(...)))`), masking policies
  * (`/root/reference/01 Create DB+Schema.sql:43-60`), state-code /
  * city-tier CASE mappings
  * (`/root/reference/02 Location Entity.sql:145-240`).
  *
  * All helpers are pure Column expressions — they stay inside
  * whole-stage codegen and push no work to the driver.
  */
object Funcs {

  /** Deterministic hash surrogate key over the natural-key columns.
    * md5 (not sha1+hash) keeps the oracle portable; collision odds at
    * 128 bits are negligible at 100 TB.
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("|", cols: _*))

  /** Keep the first two chars, star out the rest ("Jo****"). */
  def maskName(colName: String): Column = maskNameCol(col(colName))

  /** [[maskName]] over an arbitrary Column (the Scala `rpad` overload
    * only takes a literal length, so the data-dependent length goes
    * through the SQL function).
    */
  def maskNameCol(c: Column): Column =
    call_function("rpad", substring(c, 1, 2), length(c), lit("*"))

  /** Email masking policy analog: keep the first char + fixed domain. */
  def maskEmail(nameCol: Column): Column =
    concat(lower(substring(nameCol, 1, 1)), lit("***@example.com"))

  /** Numeric PII (account balance / price band) → coarse bucket. */
  def maskBalance(c: Column): Column =
    when(c < 0, "NEGATIVE").when(c < 5000, "LOW").otherwise("HIGH")

  /** Broadcast-free code mapping: a chained CASE over a small Scala
    * map (codegen'd; no join, no shuffle). For maps too big to inline,
    * use a broadcast join instead.
    */
  def codeMap(c: Column, mapping: Seq[(String, String)], default: Column): Column =
    coalesce(mapping.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }, default)

  /** Spend-tier classification (city-tier analog) over integer cents —
    * exact comparison in any engine.
    */
  def spendTier(totalCents: Column): Column =
    when(totalCents >= 30000000L, "PLATINUM")
      .when(totalCents >= 15000000L, "GOLD")
      .when(totalCents >= 5000000L, "SILVER")
      .otherwise("BRONZE")

  /** Deterministic 0-99 bucket from a stable id + salt — the basis for
    * reproducible train/val/test splits. Pure md5 arithmetic (strip
    * the hex letters, first 6 digits mod 100) so ANY engine computes
    * the identical bucket: the split of a 100 TB corpus is a pure
    * per-row expression, re-derivable forever, never a stored lookup.
    */
  def splitBucket(id: Column, salt: String): Column = hashMod(id, salt, 100)

  /** The same engine-reproducible md5-digit hash, mod an arbitrary
    * `n` up to 10^6 — for shard/bucket counts beyond 100. Drawn from
    * the full 6-digit space directly: deriving a wide count from
    * `splitBucket % n` would cap it at 100 distinct values and skew
    * whole shards 2× wherever 100 % n ≠ 0. The 6-digit draw bounds
    * what is expressible: n above 10^6 would silently collapse to at
    * most 10^6 distinct shards, so it is rejected; for n that does not
    * divide 10^6 the low shards are favored by at most 1 part in
    * 10^6/n (the usual modulo bias — negligible for realistic shard
    * counts, zero for powers of 10).
    */
  def hashMod(id: Column, salt: String, n: Int): Column = {
    require(n >= 1 && n <= 1000000,
      s"hashMod draws from a 6-digit space: n must be in [1, 10^6], got $n")
    substring(
      concat(regexp_replace(md5(concat(id.cast("string"), lit("|" + salt))),
        "[a-f]", ""), lit("000000")), 1, 6)
      .cast("bigint") % n
  }

  /** Bucket → split label with the conventional 80/10/10 default. */
  def splitLabel(bucket: Column, trainPct: Int = 80, valPct: Int = 10): Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
}
