package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFuncsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles builds n-token windows; short docs give empty array") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val out = df.select($"id", TextFuncs.shingles($"text", 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L).isEmpty)
  }

  test("stopwordHits counts marker-word occurrences") {
    val df = Seq((1L, "the cat and the dog"), (2L, "der hund ist hier")).toDF("id", "text")
    val rows = df.select($"id",
        TextFuncs.stopwordHits($"text", Seq("the", "and")),
        TextFuncs.stopwordHits($"text", Seq("der", "ist")))
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(rows(0) == (1L, 3, 0))
    assert(rows(1) == (2L, 0, 2))
  }

  test("rolling and winnow fingerprints: equal texts equal, different differ") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta")).toDF("id", "text")
    val fp = df.select($"id", TextFuncs.rollingFingerprint($"text"),
        TextFuncs.winnowFingerprint($"text", 2))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(fp(0)._2 == fp(1)._2 && fp(0)._3 == fp(1)._3)
    assert(fp(0)._2 != fp(2)._2)
  }

  test("lang-id heuristic picks the language with most marker hits") {
    val df = Seq(
      (1L, "the house of the rising sun is red and big"),
      (2L, "der hund und die katze das ist ein haus"),
      (3L, "le chat est dans la maison et les oiseaux")).toDF("doc_id", "text")
      .withColumn("lang", lit("x")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
    // reuse the production scoring by registering a temp dir? — score directly:
    val scored = TextFuncs.langMarkers.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"${lang}_hits", TextFuncs.stopwordHits($"text", words))
    }
    val rows = scored.select($"doc_id", $"en_hits", $"de_hits", $"fr_hits")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(rows(0)._2 > rows(0)._3 && rows(0)._2 > rows(0)._4) // en doc
    assert(rows(1)._3 > rows(1)._2)                            // de doc
    assert(rows(2)._4 > rows(2)._2)                            // fr doc
  }

  test("PII scrub redacts emails, phones, and digit runs in order (no double redaction)") {
    val df = Seq(
      (1L, "mail a.user1@mail.example.com or call 25-989-741-2988 ref 123456 ok"),
      (2L, "no pii here at all"),
      (3L, "short 123 stays, 9999 goes")).toDF("id", "t")
    val out = df.select($"id",
      TextFuncs.scrubPii($"t").as("s"),
      regexp_count($"t", lit(TextFuncs.EmailPat)).as("ne"),
      regexp_count(TextFuncs.scrubEmails($"t"), lit(TextFuncs.PhonePat)).as("np"),
      regexp_count(TextFuncs.scrubPhones(TextFuncs.scrubEmails($"t")),
        lit(TextFuncs.DigitRunPat)).as("nd"))
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    assert(out(0)._2 == "mail [EMAIL] or call [PHONE] ref [NUM] ok")
    assert((out(0)._3, out(0)._4, out(0)._5) == ((1, 1, 1))) // phone/digits inside email+phone not recounted
    assert(out(1)._2 == "no pii here at all")
    assert((out(1)._3, out(1)._4, out(1)._5) == ((0, 0, 0)))
    assert(out(2)._2 == "short 123 stays, [NUM] goes")
  }
}
