package graft.connector

import java.nio.file.Files

import graft.SparkSpec

/** `cat.ns.t.meta_<kind>` inspection relations: the composable form of
  * `CALL system.detail/history/tags/branches` (a CALL's output is
  * terminal; a relation joins, filters, aggregates) plus the
  * CALL-less `meta_files` / `meta_props` views.
  */
class MetadataTableSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-meta").toString
  spark.conf.set("spark.sql.catalog.gmeta", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmeta.root", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gmeta.a")
  spark.sql("""CREATE TABLE gmeta.a.t (k BIGINT, v STRING) USING graft
               TBLPROPERTIES ('keys'='k', 'numBuckets'='2', 'team'='core')""")
  spark.sql("INSERT INTO gmeta.a.t VALUES (1, 'a'), (2, 'b')")
  spark.sql("INSERT INTO gmeta.a.t VALUES (1, 'a2')")

  test("meta_history composes in SQL: aggregate over versions, and it matches CALL") {
    val hist = spark.sql(
      "SELECT version, is_current FROM gmeta.a.t.meta_history ORDER BY version")
      .as[(Long, Boolean)].collect().toSeq
    assert(hist == Seq((0L, false), (1L, false), (2L, true)))
    // the composable read the CALL form cannot do
    val newest = spark.sql(
      """SELECT max(version) FROM gmeta.a.t.meta_history
         WHERE NOT is_current""").as[Long].head()
    assert(newest == 1L)
    val viaCall = spark.sql("CALL gmeta.system.history(table => 'a.t')")
    assert(viaCall.columns.toSeq ==
      spark.table("gmeta.a.t.meta_history").columns.toSeq)
    assert(viaCall.count() == 3)
  }

  test("meta_history flags epoch starts: REPLACE and cross-epoch restore " +
      "boundaries are a SQL query") {
    spark.sql("""CREATE TABLE gmeta.a.eh (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gmeta.a.eh VALUES (1, 'a')")      // v1
    spark.sql("""REPLACE TABLE gmeta.a.eh TBLPROPERTIES ('keys'='g') AS
                 SELECT 1 AS g, 2 AS n""")                   // v2: epoch
    spark.sql("INSERT INTO gmeta.a.eh VALUES (3, 4)")        // v3
    // restore BELOW the replace epoch = itself an epoch start (v4);
    // the plain insert and the pre-replace versions are not
    graft.store.SnapshotStore.restore(spark, s"$warehouse/a/eh", 1L)
    val flagged = spark.sql(
      """SELECT version FROM gmeta.a.eh.meta_history
         WHERE is_epoch_start ORDER BY version""").as[Long].collect().toSeq
    assert(flagged == Seq(2L, 4L),
      s"expected the REPLACE (v2) and cross-epoch restore (v4), got $flagged")
    // the operator question the column exists for: "latest boundary a
    // change-feed consumer must refresh across"
    assert(spark.sql(
      """SELECT max(version) FROM gmeta.a.eh.meta_history
         WHERE is_epoch_start""").as[Long].head() == 4L)
  }

  test("meta_detail + meta_files agree on bytes; meta_files names real files") {
    val detailBytes = spark.sql(
      "SELECT CAST(sum(bytes) AS BIGINT) FROM gmeta.a.t.meta_detail")
      .as[Long].head()
    val fileBytes = spark.sql(
      "SELECT CAST(sum(bytes) AS BIGINT) FROM gmeta.a.t.meta_files WHERE kind = 'data'")
      .as[Long].head()
    assert(detailBytes == fileBytes && fileBytes > 0)
    val paths = spark.sql("SELECT path FROM gmeta.a.t.meta_files")
      .as[String].collect()
    assert(paths.nonEmpty && paths.forall(_.contains("bucket=")))
  }

  test("meta_tags, meta_branches, meta_props surface the refs and contracts") {
    spark.sql("CALL gmeta.system.tag(table => 'a.t', name => 'rel')")
    assert(spark.sql("SELECT name, version FROM gmeta.a.t.meta_tags")
      .as[(String, Long)].head() == (("rel", 2L)))
    spark.sql("CALL gmeta.system.branch(table => 'a.t', name => 'wip')")
    val br = spark.sql(
      "SELECT name, base_version FROM gmeta.a.t.meta_branches")
      .as[(String, Long)].head()
    assert(br == (("wip", 2L)))
    spark.sql("CALL gmeta.system.drop_branch(table => 'a.t', name => 'wip')")
    val team = spark.sql(
      "SELECT value FROM gmeta.a.t.meta_props WHERE key = 'team'")
      .as[String].head()
    assert(team == "core")
    // meta_stats: empty before ANALYZE; after it, per-column facts
    // with the freshness flag the scan's reporting guard uses
    assert(spark.sql("SELECT * FROM gmeta.a.t.meta_stats").count() == 0)
    spark.sql("CALL gmeta.system.analyze(table => 'a.t')")
    val stats = spark.sql(
      """SELECT column, is_fresh, ndv, null_count
         FROM gmeta.a.t.meta_stats ORDER BY column""")
      .as[(String, Boolean, Long, Long)].collect()
    assert(stats.map(_._1).toSeq == Seq("k", "v"))
    assert(stats.forall(_._2), "fresh ANALYZE must flag is_fresh")
    assert(stats.find(_._1 == "v").get._3 == 2L) // ndv of {a2, b}
    // a new commit stales the stats — visible in the view
    spark.sql("INSERT INTO gmeta.a.t VALUES (9, 'z')")
    assert(spark.sql(
      "SELECT count(*) FROM gmeta.a.t.meta_stats WHERE is_fresh").as[Long]
      .head() == 0L)
    // unknown kinds refuse with guidance; REF views (tags/branches)
    // and ANALYZE state refuse time travel — they point AT versions,
    // they don't live inside one
    val bad = intercept[Exception] {
      spark.sql("SELECT * FROM gmeta.a.t.meta_nope").collect()
    }
    assert(bad.getMessage.contains("meta_nope") ||
      bad.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
    val tt = intercept[Exception] {
      spark.sql("SELECT * FROM gmeta.a.t.meta_tags VERSION AS OF 1").collect()
    }
    assert(tt.getMessage.contains("CURRENT table state") ||
      tt.getMessage.toLowerCase.contains("not found"), tt.getMessage)
  }

  test("meta_history/meta_props/meta_files pin under VERSION AS OF, epoch-honest") {
    spark.sql("""CREATE TABLE gmeta.a.vv (k BIGINT, cents BIGINT,
                   CONSTRAINT pos CHECK (cents >= 0))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2',
                   'steward'='old-team')""")
    spark.sql("INSERT INTO gmeta.a.vv VALUES (1, 5), (2, 7)")
    val vA = spark.sql("SELECT max(version) FROM gmeta.a.vv.meta_history")
      .as[Long].head()
    spark.sql("CALL gmeta.system.tag(table => 'a.vv', name => 'pin')")
    spark.sql("INSERT INTO gmeta.a.vv VALUES (3, 9)")

    // history pinned at vA: versions stop there, is_current moves
    val hist = spark.sql(
      s"""SELECT version, is_current FROM gmeta.a.vv.meta_history
          VERSION AS OF $vA ORDER BY version""")
      .as[(Long, Boolean)].collect().toSeq
    assert(hist.map(_._1).max == vA && hist.last._2,
      s"pinned history: $hist")
    // ... and the TAG door resolves the same pin
    assert(spark.sql(
      """SELECT max(version) FROM gmeta.a.vv.meta_history
         VERSION AS OF 'pin'""").as[Long].head() == vA)
    // files pinned at vA census the OLD manifest (fewer data files)
    val filesThen = spark.sql(
      s"SELECT count(*) FROM gmeta.a.vv.meta_files VERSION AS OF $vA")
      .as[Long].head()
    val filesNow = spark.sql(
      "SELECT count(*) FROM gmeta.a.vv.meta_files").as[Long].head()
    assert(filesThen < filesNow, s"$filesThen !< $filesNow")
    // TIMESTAMP AS OF resolves through the same door
    val future = new java.sql.Timestamp(System.currentTimeMillis() + 60000)
    assert(spark.sql(
      s"""SELECT max(version) FROM gmeta.a.vv.meta_history
          TIMESTAMP AS OF '$future'""").as[Long].head() > vA)

    // REPLACE starts a new contract epoch; the pinned props view must
    // answer with the OLD epoch's contracts, the unpinned with the new
    spark.sql("""REPLACE TABLE gmeta.a.vv TBLPROPERTIES ('keys'='k',
                   'steward'='new-team') AS
                 SELECT CAST(1 AS BIGINT) AS k, CAST(-50 AS BIGINT) AS cents""")
    val propsThen = spark.sql(
      s"""SELECT key, value FROM gmeta.a.vv.meta_props VERSION AS OF $vA""")
      .as[(String, String)].collect().toMap
    assert(propsThen.get("steward").contains("old-team") &&
      propsThen.contains("constraint.check.pos"),
      s"pinned props lost the governing epoch: $propsThen")
    val propsNow = spark.table("gmeta.a.vv.meta_props")
      .as[(String, String)].collect().toMap
    assert(propsNow.get("steward").contains("new-team") &&
      !propsNow.contains("constraint.check.pos"),
      s"current props: $propsNow")
    // an unretained version refuses loudly
    val bad = intercept[Exception] {
      spark.sql("SELECT * FROM gmeta.a.vv.meta_history VERSION AS OF 999")
        .collect()
    }
    assert(bad.getMessage.contains("not in") ||
      bad.getMessage.contains("retained"), bad.getMessage)
  }
}
