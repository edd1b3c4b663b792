package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenizing,
  * shingling, stopword-based language scoring, quality stats, and
  * rolling-hash fingerprints. All pure Column expressions (codegen'd,
  * fully distributed).
  */
object TextFuncs {

  /** Whitespace tokens of the lowercased text (single-space split —
    * mirrored by `string_split(lower(text), ' ')` in DuckDB).
    */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Fixed-length passage segmentation: the token array cut into
    * consecutive `chunkLen`-token chunks, each re-joined with single
    * spaces (the d08/d09/streaming passage-dedup shape — ONE shared
    * definition so the batch queries and their streaming twins can
    * never drift). The caller must filter out empty token arrays
    * first: ceil(0/n)-1 = -1 makes `sequence` yield phantom indexes.
    */
  def passageChunks(tokens: Column, chunkLen: Int): Column =
    transform(
      sequence(lit(0), ceil(size(tokens) / lit(chunkLen.toDouble)).cast("long") - 1),
      i => concat_ws(" ", slice(tokens, (i * chunkLen + 1).cast("int"), lit(chunkLen))))

  /** n-token shingles joined by a space; empty array when the doc has
    * fewer than n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Count of tokens present in the stopword list. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(x => x: Any): _*)))

  /** Per-language stopword marker sets for the lang-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "los", "y", "es", "una", "que", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Polynomial rolling fingerprint over the token stream, kept in a
    * bounded modular domain so ANSI mode can never overflow.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 31L + pmod(xxhash64(t), lit(1000000007L))) % 2147483629L)

  /** Min-hash of the shingle set under xxhash64 — a cheap winnowing
    * fingerprint: equal for documents sharing their minimal shingle.
    */
  def winnowFingerprint(text: Column, n: Int): Column =
    array_min(transform(shingles(text, n), s => xxhash64(s)))

  // ------------------------------------------------------------------
  // PII scrubbing (free-text redaction for training corpora)
  // ------------------------------------------------------------------
  // Patterns use explicit character classes only — identical semantics
  // under Java regex (Spark) and RE2 (DuckDB), so the scrub is
  // engine-reproducible. Scrub order matters: emails first (they
  // contain digit runs), then structured phone numbers, then bare long
  // digit runs — each stage counts matches on the PREVIOUS stage's
  // output so nothing is double-counted.

  /** email-shaped spans (local@domain, dot/digit-tolerant). */
  val EmailPat = "[A-Za-z0-9.]+@[A-Za-z0-9.]+"
  /** NN-NNN-NNN-NNNN phone shape (TPC-H phone format). */
  val PhonePat = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  /** bare digit runs long enough to be ids/accounts. */
  val DigitRunPat = "[0-9]{4,}"

  def scrubEmails(text: Column): Column =
    regexp_replace(text, EmailPat, "[EMAIL]")
  def scrubPhones(text: Column): Column =
    regexp_replace(text, PhonePat, "[PHONE]")
  def scrubDigitRuns(text: Column): Column =
    regexp_replace(text, DigitRunPat, "[NUM]")

  /** Full scrub pipeline: emails → phones → digit runs. */
  def scrubPii(text: Column): Column =
    scrubDigitRuns(scrubPhones(scrubEmails(text)))
}
