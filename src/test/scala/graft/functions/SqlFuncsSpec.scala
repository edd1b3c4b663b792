package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftFunctions, SparkSpec, Tables}
import graft.operators.Dedup

/** The SQL function surface: every `graft_*` scalar function must be
  * VALUE-IDENTICAL to its Column twin — they are built from the same
  * expression definitions, so any divergence means the
  * builder→expression bridge broke, not the semantics.
  */
class SqlFuncsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docs = {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sf)
    d.createOrReplaceTempView("sqlfuncs_docs")
    d
  }

  test("text functions match their Column twins on real documents") {
    val d = docs
    val sqlSide = spark.sql(
      """SELECT doc_id,
        | graft_fingerprint(text) AS fp,
        | graft_winnow_fp(text, 3) AS wf,
        | graft_lang_id(text) AS lid,
        | graft_quality_flag(text) AS qf,
        | graft_scrub_pii(text) AS sc,
        | graft_token_stats(text) AS ts
        |FROM sqlfuncs_docs""".stripMargin)
    val colSide = d.select(col("doc_id"),
      TextFuncs.rollingFingerprint(col("text")).as("fp"),
      TextFuncs.winnowFingerprint(col("text"), 3).as("wf"),
      SqlFuncs.langId(col("text")).as("lid"),
      SqlFuncs.qualityFlag(col("text")).as("qf"),
      TextFuncs.scrubPii(col("text")).as("sc"),
      SqlFuncs.tokenStats(col("text")).as("ts"))
    assert(sqlSide.exceptAll(colSide).isEmpty && colSide.exceptAll(sqlSide).isEmpty)
    // struct field names are the t03 output columns
    assert(sqlSide.select(col("ts.*")).columns.toSeq ==
      Seq("ws_tokens", "word_tokens", "num_tokens", "punct_tokens", "bpe_ish_tokens"))
  }

  test("graft_simhash equals the explode+groupBy simhash of Dedup") {
    val d = docs
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash(text) AS sh FROM sqlfuncs_docs")
    val viaAgg = Dedup.simhash(d, "text", "doc_id")
      .select(col("doc_id"), col("simhash").as("sh"))
    val joined = viaSql.as("a").join(viaAgg.as("b"), "doc_id")
    assert(joined.count() == d.count())
    assert(joined.where(col("a.sh") =!= col("b.sh")).isEmpty)
  }

  test("masking / keying functions match their Column twins on customer") {
    GraftFunctions.register(spark)
    val c = Tables.customer(spark, sf)
    c.createOrReplaceTempView("sqlfuncs_cust")
    val sqlSide = spark.sql(
      """SELECT c_custkey AS id,
        | graft_mask_name(c_name) AS mn,
        | graft_mask_email(c_name) AS me,
        | graft_mask_balance(c_acctbal) AS mb,
        | graft_surrogate_key(c_custkey, c_name) AS sk,
        | graft_split_bucket(c_custkey, 'spec') AS sb,
        | graft_split_label(graft_split_bucket(c_custkey, 'spec')) AS sl,
        | graft_hash_mod(c_custkey, 'spec', 997) AS hm
        |FROM sqlfuncs_cust""".stripMargin)
    val bucket = Funcs.splitBucket(col("c_custkey"), "spec")
    val colSide = c.select(col("c_custkey").as("id"),
      Funcs.maskNameCol(col("c_name")).as("mn"),
      Funcs.maskEmail(col("c_name")).as("me"),
      Funcs.maskBalance(col("c_acctbal")).as("mb"),
      Funcs.surrogateKey(col("c_custkey"), col("c_name")).as("sk"),
      bucket.as("sb"),
      Funcs.splitLabel(bucket).as("sl"),
      Funcs.hashMod(col("c_custkey"), "spec", 997).as("hm"))
    assert(sqlSide.exceptAll(colSide).isEmpty && colSide.exceptAll(sqlSide).isEmpty)
  }

  test("graft_cosine_e12 matches the HOF cosine on embedding pairs") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf).where(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"),
        col("a.embedding").as("va"), col("b.embedding").as("vb"))
    pairs.createOrReplaceTempView("sqlfuncs_pairs")
    val viaSql = spark.sql(
      "SELECT ida, idb, graft_cosine_e12(va, vb) AS cos FROM sqlfuncs_pairs")
    val viaCol = pairs.select(col("ida"), col("idb"),
      VecFuncs.cosine(col("va"), col("vb")).as("cos"))
    val joined = viaSql.as("x").join(viaCol.as("y"), Seq("ida", "idb"))
    assert(joined.count() == 36)
    assert(joined.where(col("x.cos") =!= col("y.cos")).isEmpty)
  }

  test("graft_tokens / graft_shingles / graft_hamming resolve with exact values") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_tokens('A b c') AS t,
        |       graft_shingles('a b c d', 3) AS sh,
        |       graft_hamming(5, 1) AS hd,
        |       graft_spend_tier(CAST(31000000 AS BIGINT)) AS tier""".stripMargin)
      .collect().head
    assert(row.getSeq[String](0) == Seq("a", "b", "c"))
    assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(row.getAs[Number](2).longValue == 1L) // bit_count(5 XOR 1 = 4) = 1
    assert(row.getString(3) == "PLATINUM")
  }

  test("shape-constants must be literals; arity is enforced") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("sqlfuncs_docs")
    val nonLit = intercept[Throwable] {
      spark.sql("SELECT graft_winnow_fp(text, CAST(doc_id AS INT)) FROM sqlfuncs_docs")
    }
    assert(nonLit.getMessage.contains("literal"))
    val arity = intercept[Throwable] {
      spark.sql("SELECT graft_lang_id('a', 'b')")
    }
    assert(arity.getMessage.contains("argument"))
  }

  test("the session-extension injection list carries every SqlFuncs name") {
    val injected = GraftFunctions.injections.map(_._1).toSet
    assert(SqlFuncs.injections.map(_._1).forall(injected.contains))
    assert(injected.contains("graft_dot_e12"))
  }
}
