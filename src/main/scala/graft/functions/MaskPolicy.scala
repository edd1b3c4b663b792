package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative masking-policy layer — governance as data, not as
  * per-query expressions.
  *
  * Reference analog: `/root/reference/01 Create DB+Schema.sql:43-60` —
  * masking policies (`pii_name_mask`, `pii_email_mask`,
  * `pii_phone_mask`) are defined once and attached to TAGGED columns;
  * any query over a tagged column sees masked values. The Spark twin:
  * a policy is `tag → (Column => Column)`, a table's governance
  * metadata is `column → tag`, and [[applyTags]] rewrites any
  * DataFrame accordingly. Queries (e.g. q12) no longer hand-pick
  * maskers — they declare tags.
  *
  * All maskers are pure Column expressions: codegen'd, zero shuffle,
  * zero driver work — masking 100 TB costs exactly one projection.
  */
object MaskPolicy {

  type Masker = Column => Column

  /** Keep the first two chars, star the rest ("Jo****") — the
    * reference's name policy (Column form of [[Funcs.maskName]],
    * which q12's oracle pins; MaskPolicySpec asserts their parity).
    */
  val nameMask: Masker = c => call_function("rpad", substring(c, 1, 2), length(c), lit("*"))

  /** Keep the first char, fixed domain — the reference's email policy
    * (bound to [[Funcs.maskEmail]]: one source of truth).
    */
  val emailMask: Masker = Funcs.maskEmail

  /** Keep the last 4 digits — the reference's phone policy. */
  val phoneMask: Masker = c =>
    concat(lit("******"), substring(c, -4, 4))

  /** Numeric PII → coarse band (bound to [[Funcs.maskBalance]]). */
  val balanceBandMask: Masker = Funcs.maskBalance

  /** The default policy set, keyed by governance tag. */
  val defaultPolicies: Map[String, Masker] = Map(
    "pii_name" -> nameMask,
    "pii_email" -> emailMask,
    "pii_phone" -> phoneMask,
    "pii_balance" -> balanceBandMask)

  /** Apply every tagged column's policy in place. Unknown tags (no
    * policy registered) and untagged columns pass through unchanged —
    * the same permissive behavior as querying without the masking role
    * in the reference.
    */
  def applyTags(df: DataFrame, tags: Map[String, String],
                policies: Map[String, Masker] = defaultPolicies): DataFrame =
    tags.foldLeft(df) { case (d, (c, tag)) =>
      policies.get(tag).fold(d)(mask => d.withColumn(c, mask(col(c))))
    }
}
