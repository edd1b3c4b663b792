package graft.connector

import java.nio.file.Files

import graft.SparkSpec
import graft.store.SnapshotStore

/** Write-audit-publish branches: fork a zero-copy branch, stage and
  * audit candidate data on it in isolation, publish the whole state
  * onto main as ONE atomic fast-forward commit — or refuse when main
  * advanced. The staging-table-then-swap pattern the reference builds
  * by hand (`with procedures/order_proc.sql:17-30`), first-class.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String, n: Long = 100L): String = {
    val root = Files.createTempDirectory(prefix).toString + "/t"
    (1L to n).map(k => (k, s"v$k")).toDF("k", "v")
      .write.format("graft").option("keys", "k").option("numBuckets", "4")
      .save(root)
    root
  }

  private def readKeys(root: String, branch: Option[String] = None): Set[Long] = {
    val r = spark.read.format("graft")
    branch.foreach(b => r.option("branch", b))
    r.load(root).select("k").as[Long].collect().toSet
  }

  test("WAP round trip: isolated branch writes publish as one fast-forward commit") {
    val root = freshTable("graft-wap")
    val base = SnapshotStore.createBranch(spark, root, "audit")
    assert(base == SnapshotStore.latestVersion(spark, root).get)

    // stage on the branch: new keys + an upsert of an existing key
    Seq((101L, "new"), (1L, "changed")).toDF("k", "v")
      .write.format("graft").option("branch", "audit").mode("append").save(root)

    // audit view: branch sees the staged state, main is untouched
    assert(readKeys(root, Some("audit")).contains(101L))
    val mainBefore = spark.read.format("graft").load(root)
      .where($"k" === 1L).select("v").as[String].head()
    assert(mainBefore == "v1")
    assert(!readKeys(root).contains(101L))

    val pub = SnapshotStore.publishBranch(spark, root, "audit")
    assert(pub == base + 1)
    // main carries the branch's exact state
    assert(readKeys(root) == (1L to 101L).toSet)
    assert(spark.read.format("graft").load(root)
      .where($"k" === 1L).select("v").as[String].head() == "changed")
    // the branch is consumed
    assert(SnapshotStore.listBranches(spark, root).isEmpty)
    // time travel still resolves the pre-publish state
    assert(!spark.read.format("graft").option("versionAsOf", base.toString)
      .load(root).select("k").as[Long].collect().toSet.contains(101L))
  }

  test("published state survives main's vacuum (adopted dirs owned, shared dirs relative)") {
    val root = freshTable("graft-wap-vac")
    SnapshotStore.createBranch(spark, root, "b")
    Seq((200L, "x")).toDF("k", "v")
      .write.format("graft").option("branch", "b").mode("append").save(root)
    SnapshotStore.publishBranch(spark, root, "b")
    SnapshotStore.vacuum(spark, root, keepLast = 1)
    assert(readKeys(root) == ((1L to 100L).toSet + 200L))
    // and a follow-on commit + vacuum reclaims the published version's
    // dirs once superseded — adopted dirs are main's to manage
    spark.createDataFrame((1L to 100L).map(k => (k, "r")))
      .toDF("k", "v")
      .write.format("graft").mode("overwrite").option("keys", "k").save(root)
    val removed = SnapshotStore.vacuum(spark, root, keepLast = 1)
    assert(removed > 0)
    assert(readKeys(root) == (1L to 100L).toSet)
  }

  test("publish refuses when main advanced; the branch stays intact") {
    val root = freshTable("graft-wap-conf")
    SnapshotStore.createBranch(spark, root, "stale")
    Seq((300L, "branch")).toDF("k", "v")
      .write.format("graft").option("branch", "stale").mode("append").save(root)
    // main moves past the fork base
    Seq((400L, "main")).toDF("k", "v")
      .write.format("graft").mode("append").save(root)
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.publishBranch(spark, root, "stale")
    }
    assert(e.getMessage.contains("fast-forward"))
    // branch still fully readable; main unaffected
    assert(readKeys(root, Some("stale")).contains(300L))
    assert(!readKeys(root).contains(300L))
    SnapshotStore.dropBranch(spark, root, "stale")
    assert(SnapshotStore.listBranches(spark, root).isEmpty)
  }

  test("dropBranch releases the retention hold so vacuum reclaims history") {
    val root = freshTable("graft-wap-drop", n = 20L)
    SnapshotStore.createBranch(spark, root, "hold")
    Seq((21L, "x")).toDF("k", "v")
      .write.format("graft").mode("append").save(root)
    Seq((22L, "y")).toDF("k", "v")
      .write.format("graft").mode("append").save(root)
    // the branch's consumer pins history at its fork base (v0 here)
    assert(SnapshotStore.vacuum(spark, root, keepLast = 1) == 0)
    SnapshotStore.dropBranch(spark, root, "hold")
    assert(SnapshotStore.vacuum(spark, root, keepLast = 1) > 0)
    assert(readKeys(root) == (1L to 22L).toSet)
  }

  test("a crashed mid-adoption publish recovers: vacuum spares the renamed dirs, the branch rolls back whole") {
    val root = freshTable("graft-wap-crash")
    val base = SnapshotStore.createBranch(spark, root, "cr")
    Seq((500L, "staged")).toDF("k", "v")
      .write.format("graft").option("branch", "cr").mode("append").save(root)
    // simulate the crash window: renames done, marker written, no
    // manifest commit — then a competitor commits main's next version
    val br = new java.io.File(root, "_branch/cr")
    val staged = br.listFiles().filter(_.getName.startsWith("v=1-")).head
    val target = s"v=${base + 1}-pub-cr-${staged.getName.stripPrefix("v=")}"
    java.nio.file.Files.write(java.nio.file.Paths.get(br.toString, "_publishing"),
      s"pub:${base + 1}\n${staged.getName}\t$target\n".getBytes)
    // age the marker past the reclaim grace: since R16 a YOUNG marker
    // is a live publisher (rollback would corrupt its commit) and
    // recovery refuses with the documented in-flight conflict; only an
    // aged marker models a genuinely crashed publisher
    assert(new java.io.File(br, "_publishing")
      .setLastModified(System.currentTimeMillis() - 700000L))
    assert(staged.renameTo(new java.io.File(root, target)))
    Seq((600L, "competitor")).toDF("k", "v")
      .write.format("graft").mode("append").save(root)
    // the adopted-but-uncommitted dirs are now unreferenced AND at a
    // version <= latest — only the marker protects them from vacuum
    SnapshotStore.vacuum(spark, root, keepLast = 1)
    assert(new java.io.File(root, target).exists(),
      "vacuum reclaimed an in-flight publish's adopted dirs")
    // publish resolves the crash: rolls the rename back, then refuses
    // the stale fast-forward — with the branch whole again
    intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.publishBranch(spark, root, "cr")
    }
    assert(readKeys(root, Some("cr")).contains(500L))
    assert(!new java.io.File(root, target).exists())
    SnapshotStore.dropBranch(spark, root, "cr")
  }

  test("publish refuses when main's declared contracts moved (version-less ALTER)") {
    val root = freshTable("graft-wap-props")
    SnapshotStore.createBranch(spark, root, "c")
    Seq((700L, "x")).toDF("k", "v")
      .write.format("graft").option("branch", "c").mode("append").save(root)
    // a version-less metadata change on main (what ALTER TABLE does)
    SnapshotStore.writeProps(spark, root,
      Map("constraint.positive" -> "k > 0"))
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.publishBranch(spark, root, "c")
    }
    assert(e.getMessage.contains("contracts"))
    SnapshotStore.dropBranch(spark, root, "c")
  }

  test("a half-created branch still lists (it may pin vacuum) and drops clean") {
    val root = freshTable("graft-wap-half", n = 10L)
    SnapshotStore.createBranch(spark, root, "half")
    // simulate the createBranch crash before the base marker landed
    assert(new java.io.File(root, "_branch/half/_branch_base").delete())
    val listed = SnapshotStore.listBranches(spark, root)
    assert(listed == Seq(("half", -1L, 0L)))
    SnapshotStore.dropBranch(spark, root, "half")
    assert(SnapshotStore.listBranches(spark, root).isEmpty)
  }

  test("identity frontiers minted on a branch never re-mint after publish") {
    val wh = Files.createTempDirectory("graft-wap-id").toString
    spark.conf.set("spark.sql.catalog.gwap", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwap.root", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gwap.b")
    spark.sql("""CREATE TABLE gwap.b.t (
                   sk BIGINT GENERATED BY DEFAULT AS IDENTITY,
                   k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gwap.b.t (k, v) VALUES (1, 'a'), (2, 'b')")
    val root = new java.io.File(wh, "b/t").toString

    spark.sql("CALL gwap.system.branch(table => 'b.t', name => 'ids')")
    // mint on the branch through the path door
    Seq((3L, "c"), (4L, "d")).toDF("k", "v")
      .withColumn("sk", org.apache.spark.sql.functions.lit(null)
        .cast("bigint"))
      .write.format("graft").option("branch", "ids").mode("append").save(root)
    spark.sql("CALL gwap.system.publish_branch(table => 'b.t', name => 'ids')")
    // mint MORE on main after the publish
    spark.sql("INSERT INTO gwap.b.t (k, v) VALUES (5, 'e'), (6, 'f')")
    val sks = spark.table("gwap.b.t").select("sk").as[Long].collect()
    assert(sks.length == 6 && sks.distinct.length == 6,
      s"identity collision after publish: ${sks.mkString(",")}")
  }

  test("pure-SQL WAP: SELECT / INSERT / MERGE on cat.ns.t.branch_<name>") {
    val wh = Files.createTempDirectory("graft-wap-sql").toString
    spark.conf.set("spark.sql.catalog.gwsq", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwsq.root", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gwsq.b")
    spark.sql("CREATE TABLE gwsq.b.t (k BIGINT, v STRING) USING graft " +
      "TBLPROPERTIES ('keys'='k', 'numBuckets'='2')")
    spark.sql("INSERT INTO gwsq.b.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL gwsq.system.branch(table => 'b.t', name => 'stage')")

    // stage via SQL INSERT and row-level MERGE against the branch name
    spark.sql("INSERT INTO gwsq.b.t.branch_stage VALUES (3, 'c')")
    spark.sql("""MERGE INTO gwsq.b.t.branch_stage tgt
                 USING (SELECT 1 AS k, 'a2' AS v) src ON tgt.k = src.k
                 WHEN MATCHED THEN UPDATE SET v = src.v""")
    // audit from SQL: branch has the staged state, main is untouched
    assert(spark.sql("SELECT v FROM gwsq.b.t.branch_stage WHERE k = 1")
      .collect().head.getString(0) == "a2")
    assert(spark.sql("SELECT count(*) FROM gwsq.b.t").collect()
      .head.getLong(0) == 2)

    spark.sql("CALL gwsq.system.publish_branch(table => 'b.t', name => 'stage')")
    val fin = spark.sql("SELECT k, v FROM gwsq.b.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(fin == Seq((1L, "a2"), (2L, "b"), (3L, "c")))
    // the branch identifier no longer resolves
    intercept[Exception](spark.sql("SELECT * FROM gwsq.b.t.branch_stage").collect())
  }

  test("CALL system.branches lists live branches; drop_branch removes") {
    val wh = Files.createTempDirectory("graft-wap-ls").toString
    spark.conf.set("spark.sql.catalog.gwls", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwls.root", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gwls.b")
    spark.sql("CREATE TABLE gwls.b.t (k BIGINT, v STRING) USING graft " +
      "TBLPROPERTIES ('keys'='k')")
    spark.sql("INSERT INTO gwls.b.t VALUES (1, 'a')")
    spark.sql("CALL gwls.system.branch(table => 'b.t', name => 'one')")
    spark.sql("CALL gwls.system.branch(table => 'b.t', name => 'two')")
    val listed = spark.sql("CALL gwls.system.branches(table => 'b.t')")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(listed.map(_._1) == Seq("one", "two"))
    assert(spark.sql("CALL gwls.system.drop_branch(table => 'b.t', " +
      "name => 'one')").collect().head.getBoolean(0))
    assert(spark.sql("CALL gwls.system.branches(table => 'b.t')")
      .collect().map(_.getString(0)).toSeq == Seq("two"))
    // writes through the branch door refuse for a branch that was never created
    val err = intercept[Exception] {
      Seq((9L, "z")).toDF("k", "v").write.format("graft")
        .option("branch", "nope").mode("append")
        .save(new java.io.File(wh, "b/t").toString)
    }
    assert(err.getMessage.contains("nope"))
  }
}
