package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StringType}

/** The library's scalar functions exposed as SQL functions
  * (`SELECT graft_lang_id(text) …`) for the SQL-only persona the
  * reference serves (its whole surface is Snowflake SQL — masking
  * policies in `04 Data Masking.sql`, derived columns throughout the
  * procedure bodies).
  *
  * Each builder REUSES the exact `Column` definition from
  * [[TextFuncs]] / [[Funcs]] / [[VecFuncs]] — the SQL name and the
  * Scala API can never drift because they are the same expression
  * tree (`ExpressionUtils.column`/`expression` bridge the arg
  * expressions in and the composed Column back out). Everything stays
  * inside whole-stage codegen: these are builtin-function
  * compositions, not UDFs.
  *
  * Registration: `graft.GraftFunctions.register(spark)` (idempotent)
  * or the `spark.sql.extensions=graft.GraftExtensions` session
  * extension — the same two routes the native expressions use.
  *
  * Literal-argument contract: tuning constants (shingle width, hash
  * salt, modulus) must be LITERALS in the SQL text — they parameterize
  * the expression shape, so a per-row value cannot work. Builders
  * refuse non-literals with a clear message at analysis time.
  */
object SqlFuncs {

  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def ex(col: Column): Expression = ColumnBridge.expression(col)

  private def need(fn: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$fn expects $n argument(s), got ${args.length}")

  private def litInt(fn: String, what: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an INT literal (it shapes the expression), got: $other")
  }

  private def litStr(fn: String, what: String, e: Expression): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a STRING literal (it shapes the expression), got: $other")
  }

  /** t03's five token counts as one struct — field names are the t03
    * output columns, so `graft_token_stats(text).*` (via a subquery
    * alias) reproduces the oracle-checked t03 frame.
    */
  def tokenStats(text: Column): Column = struct(
    size(split(trim(text), " +")).cast("long").as("ws_tokens"),
    regexp_count(text, lit("[A-Za-z]+")).cast("long").as("word_tokens"),
    regexp_count(text, lit("[0-9]+")).cast("long").as("num_tokens"),
    regexp_count(text, lit("[^A-Za-z0-9 ]")).cast("long").as("punct_tokens"),
    (regexp_count(text, lit("[A-Za-z]+")) + regexp_count(text, lit("[0-9]+"))
      + regexp_count(text, lit("[^A-Za-z0-9 ]"))).cast("long").as("bpe_ish_tokens"))

  /** t01's language-ID verdict as a scalar: argmax over the
    * [[TextFuncs.langMarkers]] stopword hit counts with t01's exact
    * first-wins tie-break (en ≥ de ≥ es ≥ fr ≥ zh).
    */
  def langId(text: Column): Column = {
    val hits = TextFuncs.langMarkers.map { case (lang, words) =>
      lang -> TextFuncs.stopwordHits(text, words)
    }
    val Seq(en, de, es, fr, zh) = hits.map(_._2)
    when(en >= de && en >= es && en >= fr && en >= zh, "en")
      .when(de >= es && de >= fr && de >= zh, "de")
      .when(es >= fr && es >= zh, "es")
      .when(fr >= zh, "fr")
      .otherwise("zh")
  }

  /** t02's quality verdict as a scalar (good/ok/low from token count
    * and alphabetic-character share).
    */
  def qualityFlag(text: Column): Column = {
    val nTokens = size(split(trim(text), " +")).cast("long")
    val alphaPctFloor = floor(
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") * 100d / length(text))
    when(nTokens >= 20 && alphaPctFloor >= 70, "good")
      .when(nTokens >= 5, "ok")
      .otherwise("low")
  }

  /** Scalar simhash over the token array — the same 64-bit majority
    * fingerprint [[graft.operators.Dedup.simhash]] computes with an
    * explode+groupBy (which is the right shape for reusing the token
    * pass across signals). This form is one pass over the array with a
    * 64-lane accumulator: per token, lane k moves ±1 by bit k of the
    * token's xxhash64; a positive final lane sets bit k.
    */
  def simhashScalar(text: Column): Column = {
    val hashes = transform(TextFuncs.tokens(text), t => xxhash64(t))
    val lanes = sequence(lit(0), lit(63))
    val sums = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, lanes, (a, k) =>
        a + when(call_function("shiftright", h, k).bitwiseAND(1) === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(sums, lanes, (s, k) =>
        when(s > 0, call_function("shiftleft", lit(1L), k)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SQL-name → builder. Kept separate from the ExpressionInfo
    * plumbing in [[graft.GraftFunctions]] so this file stays a pure
    * function table.
    */
  val injections: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_tokens" -> { args: Seq[Expression] =>
      need("graft_tokens", 1, args)
      ex(TextFuncs.tokens(c(args(0))))
    },
    "graft_shingles" -> { args: Seq[Expression] =>
      need("graft_shingles", 2, args)
      ex(TextFuncs.shingles(c(args(0)), litInt("graft_shingles", "n (arg 2)", args(1))))
    },
    "graft_token_stats" -> { args: Seq[Expression] =>
      need("graft_token_stats", 1, args)
      ex(tokenStats(c(args(0))))
    },
    "graft_lang_id" -> { args: Seq[Expression] =>
      need("graft_lang_id", 1, args)
      ex(langId(c(args(0))))
    },
    "graft_quality_flag" -> { args: Seq[Expression] =>
      need("graft_quality_flag", 1, args)
      ex(qualityFlag(c(args(0))))
    },
    "graft_fingerprint" -> { args: Seq[Expression] =>
      need("graft_fingerprint", 1, args)
      ex(TextFuncs.rollingFingerprint(c(args(0))))
    },
    "graft_winnow_fp" -> { args: Seq[Expression] =>
      need("graft_winnow_fp", 2, args)
      ex(TextFuncs.winnowFingerprint(c(args(0)), litInt("graft_winnow_fp", "n (arg 2)", args(1))))
    },
    "graft_simhash" -> { args: Seq[Expression] =>
      need("graft_simhash", 1, args)
      ex(simhashScalar(c(args(0))))
    },
    "graft_hamming" -> { args: Seq[Expression] =>
      need("graft_hamming", 2, args)
      ex(graft.operators.Dedup.hamming(c(args(0)), c(args(1))))
    },
    "graft_scrub_pii" -> { args: Seq[Expression] =>
      need("graft_scrub_pii", 1, args)
      ex(TextFuncs.scrubPii(c(args(0))))
    },
    "graft_mask_name" -> { args: Seq[Expression] =>
      need("graft_mask_name", 1, args)
      ex(Funcs.maskNameCol(c(args(0))))
    },
    "graft_mask_email" -> { args: Seq[Expression] =>
      need("graft_mask_email", 1, args)
      ex(Funcs.maskEmail(c(args(0))))
    },
    "graft_mask_balance" -> { args: Seq[Expression] =>
      need("graft_mask_balance", 1, args)
      ex(Funcs.maskBalance(c(args(0))))
    },
    "graft_spend_tier" -> { args: Seq[Expression] =>
      need("graft_spend_tier", 1, args)
      ex(Funcs.spendTier(c(args(0))))
    },
    "graft_surrogate_key" -> { args: Seq[Expression] =>
      require(args.nonEmpty, "graft_surrogate_key expects at least one column")
      ex(Funcs.surrogateKey(args.map(c): _*))
    },
    "graft_split_bucket" -> { args: Seq[Expression] =>
      need("graft_split_bucket", 2, args)
      ex(Funcs.splitBucket(c(args(0)), litStr("graft_split_bucket", "salt (arg 2)", args(1))))
    },
    "graft_split_label" -> { args: Seq[Expression] =>
      need("graft_split_label", 1, args)
      ex(Funcs.splitLabel(c(args(0))))
    },
    "graft_hash_mod" -> { args: Seq[Expression] =>
      need("graft_hash_mod", 3, args)
      ex(Funcs.hashMod(c(args(0)),
        litStr("graft_hash_mod", "salt (arg 2)", args(1)),
        litInt("graft_hash_mod", "n (arg 3)", args(2))))
    },
    "graft_cosine_e12" -> { args: Seq[Expression] =>
      need("graft_cosine_e12", 2, args)
      ex(VecFuncs.cosineNative(c(args(0)), c(args(1))))
    })
}
