package graft

import graft.functions.TextFuncs

/** The SQL scalar-function surface (SURVEY.md §2 keys f01/f02): the
  * same text-analysis and masking semantics as the t/q keys, but
  * driven ENTIRELY through `spark.sql` with the registered
  * `graft_*` functions ([[graft.functions.SqlFuncs]]) — the SQL-only
  * persona's path. The DuckDB oracles are assembled from the SAME
  * proven fragments the underlying t01/t02/t03/t06/t08/q12 oracles
  * use, so a mismatch here isolates the FUNCTION-REGISTRATION layer
  * (builder → expression → analysis), not the semantics.
  */
object QueriesFuncs {
  import Queries.Q

  // =====================================================================
  // f01 — text analysis via SQL functions over documents: token
  // stats (struct expansion), language ID, quality flag, PII scrub,
  // and the deterministic train/val/test split.
  // =====================================================================
  val f01: Q = (s, d) => {
    GraftFunctions.register(s)
    Tables.documents(s, d).createOrReplaceTempView("f01_documents")
    s.sql(
      """SELECT doc_id,
        | ts.ws_tokens AS ws_tokens,
        | ts.word_tokens AS word_tokens,
        | ts.num_tokens AS num_tokens,
        | ts.punct_tokens AS punct_tokens,
        | ts.bpe_ish_tokens AS bpe_ish_tokens,
        | graft_lang_id(text) AS pred_lang,
        | graft_quality_flag(text) AS quality_flag,
        | graft_scrub_pii(text) AS scrubbed,
        | split_bucket,
        | graft_split_label(split_bucket) AS split
        |FROM (
        | SELECT doc_id, text, graft_token_stats(text) AS ts,
        |        graft_split_bucket(doc_id, 'graft') AS split_bucket
        | FROM f01_documents)""".stripMargin)
  }

  val f01Sql: String = {
    def hits(words: Seq[String]) = {
      val inList = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(lower(text), ' '), x -> x IN ($inList)))"
    }
    val m = TextFuncs.langMarkers.toMap
    val s1 = s"regexp_replace(text, '${TextFuncs.EmailPat}', '[EMAIL]', 'g')"
    val s2 = s"regexp_replace($s1, '${TextFuncs.PhonePat}', '[PHONE]', 'g')"
    val s3 = s"regexp_replace($s2, '${TextFuncs.DigitRunPat}', '[NUM]', 'g')"
    s"""WITH sb AS (
       | SELECT doc_id, text,
       |   CAST(CAST(substr(regexp_replace(md5(CAST(doc_id AS VARCHAR) || '|graft'),
       |     '[a-f]', '', 'g') || '000000', 1, 6) AS BIGINT) % 100 AS BIGINT) AS split_bucket
       | FROM documents)
       |SELECT doc_id,
       | len(string_split_regex(trim(text), ' +')) AS ws_tokens,
       | len(regexp_extract_all(text, '[A-Za-z]+')) AS word_tokens,
       | len(regexp_extract_all(text, '[0-9]+')) AS num_tokens,
       | len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS punct_tokens,
       | len(regexp_extract_all(text, '[A-Za-z]+')) + len(regexp_extract_all(text, '[0-9]+'))
       |   + len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS bpe_ish_tokens,
       | CASE
       |  WHEN ${hits(m("en"))} >= ${hits(m("de"))} AND ${hits(m("en"))} >= ${hits(m("es"))}
       |   AND ${hits(m("en"))} >= ${hits(m("fr"))} AND ${hits(m("en"))} >= ${hits(m("zh"))} THEN 'en'
       |  WHEN ${hits(m("de"))} >= ${hits(m("es"))} AND ${hits(m("de"))} >= ${hits(m("fr"))}
       |   AND ${hits(m("de"))} >= ${hits(m("zh"))} THEN 'de'
       |  WHEN ${hits(m("es"))} >= ${hits(m("fr"))} AND ${hits(m("es"))} >= ${hits(m("zh"))} THEN 'es'
       |  WHEN ${hits(m("fr"))} >= ${hits(m("zh"))} THEN 'fr'
       |  ELSE 'zh' END AS pred_lang,
       | CASE WHEN len(string_split_regex(trim(text), ' +')) >= 20
       |        AND floor(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) * 100 / length(text)) >= 70 THEN 'good'
       |      WHEN len(string_split_regex(trim(text), ' +')) >= 5 THEN 'ok'
       |      ELSE 'low' END AS quality_flag,
       | $s3 AS scrubbed,
       | split_bucket,
       | CASE WHEN split_bucket < 80 THEN 'train'
       |      WHEN split_bucket < 90 THEN 'val' ELSE 'test' END AS split
       |FROM sb""".stripMargin
  }

  // =====================================================================
  // f02 — masking / keying via SQL functions over customer: the q12
  // masks plus the md5 surrogate key and the engine-reproducible
  // hash-mod sharding.
  // =====================================================================
  val f02: Q = (s, d) => {
    GraftFunctions.register(s)
    Tables.customer(s, d).createOrReplaceTempView("f02_customer")
    s.sql(
      """SELECT c_custkey AS customer_id,
        | graft_mask_name(c_name) AS masked_name,
        | graft_mask_email(c_name) AS masked_email,
        | graft_mask_balance(c_acctbal) AS balance_band,
        | graft_surrogate_key(c_custkey, c_name) AS sk,
        | graft_hash_mod(c_custkey, 'f02', 1000) AS shard
        |FROM f02_customer""".stripMargin)
  }

  val f02Sql: String =
    """SELECT c_custkey AS customer_id,
      | rpad(substring(c_name, 1, 2), CAST(length(c_name) AS INTEGER), '*') AS masked_name,
      | concat(lower(substring(c_name, 1, 1)), '***@example.com') AS masked_email,
      | CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
      |      WHEN c_acctbal < 5000 THEN 'LOW' ELSE 'HIGH' END AS balance_band,
      | md5(concat_ws('|', CAST(c_custkey AS VARCHAR), c_name)) AS sk,
      | CAST(CAST(substr(regexp_replace(md5(CAST(c_custkey AS VARCHAR) || '|f02'),
      |   '[a-f]', '', 'g') || '000000', 1, 6) AS BIGINT) % 1000 AS BIGINT) AS shard
      |FROM customer""".stripMargin

  val all: Map[String, Q] = Map(
    "f01_sql_text_funcs" -> f01,
    "f02_sql_masking_funcs" -> f02)

  val oracles: Map[String, String] = Map(
    "f01_sql_text_funcs" -> f01Sql,
    "f02_sql_masking_funcs" -> f02Sql)
}
