package graft.connector

import java.nio.file.Files

import graft.SparkSpec
import graft.store.SnapshotStore

/** Tags: named IMMUTABLE version refs — `CALL system.tag` bookmarks a
  * retained version, `VERSION AS OF '<name>'` and the `t.tag_<name>`
  * identifier read it, vacuum keeps history from the oldest tag, and
  * a tag can never be silently re-pointed (drop + re-create is the
  * explicit move). The read-only pin complements the movable write
  * head a branch is.
  */
class TagSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-tag").toString
  spark.conf.set("spark.sql.catalog.gtag", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gtag.root", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gtag.a")

  test("tag lifecycle: create, read via VERSION AS OF name + tag_ identifier, list, drop") {
    spark.sql("""CREATE TABLE gtag.a.t (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gtag.a.t VALUES (1, 'a'), (2, 'b')")
    val tagged = spark.sql("CALL gtag.system.tag(table => 'a.t', name => 'rel1')")
      .as[Long].head()
    assert(tagged == 1L)
    // table moves on; the tag does not
    spark.sql("INSERT INTO gtag.a.t VALUES (1, 'a2'), (3, 'c')")
    assert(spark.table("gtag.a.t").count() == 3)
    val byName = spark.sql("SELECT * FROM gtag.a.t VERSION AS OF 'rel1'")
      .as[(Long, String)].collect().toSet
    assert(byName == Set((1L, "a"), (2L, "b")))
    val byIdent = spark.sql("SELECT * FROM gtag.a.t.tag_rel1")
      .as[(Long, String)].collect().toSet
    assert(byIdent == Set((1L, "a"), (2L, "b")))
    // numeric VERSION AS OF still works alongside
    assert(spark.sql("SELECT * FROM gtag.a.t VERSION AS OF 1").count() == 2)
    val listed = spark.sql("CALL gtag.system.tags(table => 'a.t')")
      .as[(String, Long)].collect().toSeq
    assert(listed == Seq(("rel1", 1L)))
    // immutable: re-tagging the same name refuses
    val dup = intercept[Exception] {
      spark.sql("CALL gtag.system.tag(table => 'a.t', name => 'rel1')")
    }
    assert(dup.getMessage.contains("immutable"))
    assert(spark.sql("CALL gtag.system.drop_tag(table => 'a.t', name => 'rel1')")
      .as[Boolean].head())
    assert(spark.sql("CALL gtag.system.tags(table => 'a.t')").count() == 0)
    val gone = intercept[Exception] {
      spark.sql("SELECT * FROM gtag.a.t VERSION AS OF 'rel1'").collect()
    }
    assert(gone.getMessage.contains("rel1"))
  }

  test("a tag pins vacuum retention; drop_tag releases it") {
    spark.sql("""CREATE TABLE gtag.a.vt (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gtag.a.vt VALUES (1, 'a')")
    spark.sql("CALL gtag.system.tag(table => 'a.vt', name => 'pin', version => 1)")
    spark.sql("INSERT INTO gtag.a.vt VALUES (1, 'b')")
    spark.sql("INSERT INTO gtag.a.vt VALUES (1, 'c')")
    // keepLast=1 would reclaim v0..v2 — the tag at v1 must hold v1+
    spark.sql("CALL gtag.system.vacuum(table => 'a.vt', keep_last => 1)")
    val dir = s"$warehouse/a/vt"
    assert(SnapshotStore.versions(spark, dir).contains(1L))
    assert(spark.sql("SELECT v FROM gtag.a.vt VERSION AS OF 'pin'")
      .as[String].head() == "a")
    // released: the next vacuum reclaims pre-latest history
    spark.sql("CALL gtag.system.drop_tag(table => 'a.vt', name => 'pin')")
    spark.sql("CALL gtag.system.vacuum(table => 'a.vt', keep_last => 1)")
    assert(!SnapshotStore.versions(spark, dir).contains(1L))
    assert(spark.table("gtag.a.vt").as[(Long, String)].head() == ((1L, "c")))
  }

  test("tags refuse unretained versions and writes through tag identifiers refuse") {
    spark.sql("""CREATE TABLE gtag.a.g (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k')""")
    spark.sql("INSERT INTO gtag.a.g VALUES (1, 'a')")
    val bad = intercept[Exception] {
      spark.sql("CALL gtag.system.tag(table => 'a.g', name => 'x', version => 99)")
    }
    assert(bad.getMessage.contains("not a retained version"))
    spark.sql("CALL gtag.system.tag(table => 'a.g', name => 'x')")
    val wr = intercept[Exception] {
      spark.sql("INSERT INTO gtag.a.g.tag_x VALUES (9, 'z')")
    }
    assert(wr.getMessage.toLowerCase.contains("time-travel") ||
      wr.getMessage.toLowerCase.contains("cannot write"), wr.getMessage)
    // the path-door read option resolves the same pin
    val viaOption = spark.read.format("graft").option("tagAsOf", "x")
      .load(s"$warehouse/a/g").as[(Long, String)].collect().toSet
    assert(viaOption == Set((1L, "a")))
  }

  test("all-digit tag names refuse: VERSION AS OF resolves numbers as versions first") {
    spark.sql("""CREATE TABLE gtag.a.d (k BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k')""")
    spark.sql("INSERT INTO gtag.a.d VALUES (1)")
    // a tag named '123' could never be read by name — and might
    // silently resolve to an unrelated version number
    val e = intercept[Exception] {
      spark.sql("CALL gtag.system.tag(table => 'a.d', name => '123')")
    }
    assert(e.getMessage.contains("reserved for version ids"), e.getMessage)
    // a digit-CONTAINING name is fine
    spark.sql("CALL gtag.system.tag(table => 'a.d', name => 'v123')")
    assert(spark.sql("SELECT * FROM gtag.a.d VERSION AS OF 'v123'").count() == 1)
  }

  test("a pre-existing all-digit tag stays listable and droppable (guard is create-only)") {
    spark.sql("""CREATE TABLE gtag.a.stale (k BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k')""")
    spark.sql("INSERT INTO gtag.a.stale VALUES (1)")
    // simulate a tag created before the all-digit reservation existed:
    // write the tag file directly, as the old createTag would have
    val tagsDir = java.nio.file.Paths.get(warehouse, "a", "stale", "_tags")
    java.nio.file.Files.createDirectories(tagsDir)
    java.nio.file.Files.write(tagsDir.resolve("123"), "1\n".getBytes)
    // it must list and drop — a guard in the resolve/delete path would
    // make the stale tag both unreadable and un-droppable
    val listed = spark.sql("CALL gtag.system.tags(table => 'a.stale')")
      .as[(String, Long)].collect().toSeq
    assert(listed == Seq(("123", 1L)), s"listed: $listed")
    assert(spark.sql("CALL gtag.system.drop_tag(table => 'a.stale', name => '123')")
      .as[Boolean].head())
    assert(spark.sql("CALL gtag.system.tags(table => 'a.stale')").count() == 0)
    // creating a NEW all-digit tag still refuses
    val e = intercept[Exception] {
      spark.sql("CALL gtag.system.tag(table => 'a.stale', name => '123')")
    }
    assert(e.getMessage.contains("reserved for version ids"), e.getMessage)
  }
}
