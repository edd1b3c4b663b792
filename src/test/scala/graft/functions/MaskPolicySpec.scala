package graft.functions

import graft.SparkSpec

class MaskPolicySpec extends SparkSpec {
  import spark.implicits._

  test("applyTags masks tagged columns in place, passes untagged through") {
    val df = Seq((1L, "Johnson", "Johnson", "9876543210", 42.0, "AUTO"))
      .toDF("id", "name", "email_src", "phone", "balance", "segment")
    val masked = MaskPolicy.applyTags(df, Map(
      "name" -> "pii_name",
      "email_src" -> "pii_email",
      "phone" -> "pii_phone",
      "balance" -> "pii_balance",
      "segment" -> "no_such_policy")) // unknown tag → untouched
    val r = masked.as[(Long, String, String, String, String, String)].head()
    assert(r == ((1L, "Jo*****", "j***@example.com", "******3210", "LOW", "AUTO")))
  }

  test("policy layer and the legacy per-query maskers agree (q12 contract)") {
    val df = Seq(Tuple1("Al"), Tuple1("Alexander")).toDF("c_name")
    val viaPolicy = MaskPolicy.applyTags(df.withColumnRenamed("c_name", "m"),
        Map("m" -> "pii_name")).as[String].collect().toSeq
    val viaFuncs = df.select(Funcs.maskName("c_name")).as[String].collect().toSeq
    assert(viaPolicy == viaFuncs)
  }
}
