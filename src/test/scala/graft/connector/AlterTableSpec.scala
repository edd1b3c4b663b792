package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.SnapshotStore

/** SQL `ALTER TABLE` over graft catalog tables: ADDITIVE evolution
  * only. ADD COLUMN declares a new nullable column in the `_schema`
  * breadcrumb — history null-fills immediately (no rewrite of any
  * file), new writes carry it, old versions stay readable. SET/UNSET
  * TBLPROPERTIES manage the `_props` breadcrumb, with
  * `dml.mode=delta` verifying the not-null-key contract against the
  * data before recording it. Drops, renames and type changes refuse
  * loudly — they would rewrite history.
  */
class AlterTableSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-alter-wh").toString
  locally {
    spark.conf.set("spark.sql.catalog.alt",
      classOf[graft.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.alt.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS alt.ns")
  }

  private var n = 0
  private def freshTable(count: Int = 20): (String, String) = {
    n += 1
    val t = s"a$n"
    (1 to count).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .createOrReplaceTempView(s"alter_src_$n")
    spark.sql(
      s"""CREATE TABLE alt.ns.$t USING graft
         |TBLPROPERTIES ('keys'='k', 'numBuckets'='4')
         |AS SELECT * FROM alter_src_$n""".stripMargin)
    (s"alt.ns.$t", s"$warehouse/ns/$t")
  }

  test("ADD COLUMN: history null-fills, new writes carry it, old versions readable") {
    val (name, root) = freshTable()
    val v1 = SnapshotStore.latestVersion(spark, root).get
    spark.sql(s"ALTER TABLE $name ADD COLUMN cents BIGINT")
    // no data rewrite happened: same version, evolution is metadata
    assert(SnapshotStore.latestVersion(spark, root).get == v1)
    // existing rows read back with the new column null-filled
    val widened = spark.table(name)
    assert(widened.columns.toSeq == Seq("k", "v", "cents"))
    assert(widened.where(col("cents").isNotNull).count() == 0)
    assert(widened.count() == 20)
    // the new column is queryable and filterable right away
    assert(spark.sql(s"SELECT k FROM $name WHERE cents IS NULL").count() == 20)
    // an INSERT carrying the new column works, and mixes with history
    spark.sql(s"INSERT INTO $name VALUES (100, 'new', 555)")
    val got = spark.table(name).as[(Long, String, Option[Long])].collect().toSet
    assert(got((100L, "new", Some(555L))))
    assert(got((1L, "v1", None)))
    assert(got.size == 21)
    // an UPDATE can backfill it through the ordinary DML path
    spark.sql(s"UPDATE $name SET cents = k * 10 WHERE k <= 3")
    assert(spark.table(name).where(col("cents").isNotNull).count() == 4)
    // old versions remain readable and ALSO present the declared
    // column (null-filled — the breadcrumb is table metadata, history
    // predates the data)
    val old = spark.read.format("graft").option("versionAsOf", v1).load(root)
    assert(old.columns.contains("cents") && old.count() == 20)
    assert(old.where(col("cents").isNotNull).count() == 0)
  }

  test("ADD COLUMN refuses NOT NULL, nested, positioned and duplicate columns") {
    val (name, _) = freshTable()
    val e1 = intercept[Exception](
      spark.sql(s"ALTER TABLE $name ADD COLUMN nn BIGINT NOT NULL"))
    assert(e1.getMessage.toLowerCase.contains("null"))
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $name ADD COLUMN v STRING"))
    assert(e2.getMessage.toLowerCase.contains("exists") ||
      e2.getMessage.toLowerCase.contains("already"))
    val e3 = intercept[Exception](
      spark.sql(s"ALTER TABLE $name ADD COLUMN f2 BIGINT FIRST"))
    assert(e3.getMessage.toLowerCase.contains("position") ||
      e3.getMessage.toLowerCase.contains("append"))
  }

  test("a multi-change ALTER is atomic: partial failure applies nothing") {
    val (name, root) = freshTable()
    // second column is NOT NULL → refused; the FIRST column must not
    // have been recorded either (a half-applied ALTER would make the
    // corrected retry fail on 'already exists')
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $name ADD COLUMNS (c1 STRING, c2 STRING NOT NULL)"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("nullable"))))
    assert(!spark.table(name).columns.contains("c1"))
    // the corrected statement applies both
    spark.sql(s"ALTER TABLE $name ADD COLUMNS (c1 STRING, c2 STRING)")
    assert(spark.table(name).columns.toSeq.takeRight(2) == Seq("c1", "c2"))
  }

  test("case-variant dml.mode property normalizes instead of silently missing") {
    val (name, root) = freshTable()
    // an invalid VALUE under a case-variant KEY must still be validated
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $name SET TBLPROPERTIES ('DML.Mode'='bogus')"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("dml.mode must be"))))
    // and a valid one lands under the canonical key, visible to the
    // enforcement lookups
    spark.sql(s"ALTER TABLE $name SET TBLPROPERTIES ('DML.Mode'='delta')")
    assert(SnapshotStore.readProps(spark, root).get("dml.mode").contains("delta"))
  }

  test("destructive ALTERs refuse loudly") {
    val (name, _) = freshTable()
    for (stmt <- Seq(
      s"ALTER TABLE $name DROP COLUMN v",
      s"ALTER TABLE $name RENAME COLUMN v TO w",
      s"ALTER TABLE $name ALTER COLUMN k TYPE INT")) {
      val e = intercept[Exception](spark.sql(stmt))
      assert(e.getMessage != null, stmt)
    }
    // table unharmed
    assert(spark.table(name).columns.toSeq == Seq("k", "v"))
  }

  test("SET TBLPROPERTIES dml.mode=delta validates data, then binds every writer") {
    val (name, root) = freshTable()
    spark.sql(s"ALTER TABLE $name SET TBLPROPERTIES ('dml.mode'='delta')")
    assert(SnapshotStore.readProps(spark, root)("dml.mode") == "delta")
    // from now on the delta path serves subquery DELETE as tombstones
    Seq(1L, 2L).toDF("dk").createOrReplaceTempView("alt_delkeys")
    val before = SnapshotStore.readManifest(spark, root,
      SnapshotStore.latestVersion(spark, root).get)
    spark.sql(s"DELETE FROM $name WHERE k IN (SELECT dk FROM alt_delkeys)")
    val after = SnapshotStore.readManifest(spark, root,
      SnapshotStore.latestVersion(spark, root).get)
    for ((b, e) <- before.buckets)
      assert(after.buckets(b).dir == e.dir, s"bucket $b was rewritten")
    assert(after.buckets.values.exists(_.tombstones.nonEmpty))
    // and the write-side contract holds
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $name SELECT CAST(NULL AS BIGINT), 'x'"))
    assert(e.getMessage != null)
    // UNSET returns the table to cow + nullable keys
    spark.sql(s"ALTER TABLE $name UNSET TBLPROPERTIES ('dml.mode')")
    assert(!SnapshotStore.readProps(spark, root).contains("dml.mode"))
    spark.sql(s"INSERT INTO $name SELECT CAST(NULL AS BIGINT), 'nullk'")
    assert(spark.table(name).where(col("k").isNull).count() == 1)
  }

  test("SET dml.mode=delta refuses when existing rows hold null keys") {
    n += 1
    val t = s"a$n"
    spark.sql(
      s"""CREATE TABLE alt.ns.$t (k BIGINT, v STRING) USING graft
         |TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""".stripMargin)
    spark.sql(s"INSERT INTO alt.ns.$t VALUES (1, 'a'), (NULL, 'nullk')")
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE alt.ns.$t SET TBLPROPERTIES ('dml.mode'='delta')"))
    assert(e.getMessage.contains("null merge key") ||
      e.getMessage.contains("null"), e.getMessage)
    assert(!SnapshotStore.readProps(spark, s"$warehouse/ns/$t").contains("dml.mode"))
  }

  test("layout properties cannot be set or unset") {
    val (name, _) = freshTable()
    for (stmt <- Seq(
      s"ALTER TABLE $name SET TBLPROPERTIES ('numBuckets'='8')",
      s"ALTER TABLE $name SET TBLPROPERTIES ('keys'='v')",
      s"ALTER TABLE $name UNSET TBLPROPERTIES ('keys')")) {
      val e = intercept[Exception](spark.sql(stmt))
      assert(e.getMessage != null, stmt)
    }
  }
}
