package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.SnapshotStore

/** SQL row-level operations against cataloged graft tables: DELETE
  * FROM (metadata/tombstone path AND group-rewrite path), UPDATE,
  * MERGE INTO (the reference's procedure shape as literal SQL), plus
  * the filter-scoped `writeTo(...).overwrite(cond)`. Each case checks
  * both the SEMANTICS (final state vs a relational recompute) and the
  * SCALE CONTRACT (tombstones instead of rewrites where promised;
  * untouched buckets re-pointed, not rewritten).
  */
class RowLevelSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-rl-wh").toString
  locally {
    spark.conf.set("spark.sql.catalog.rl",
      classOf[graft.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rl.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rl.ns")
  }

  private var n = 0
  /** Fresh cataloged table of (k, v, cents): k 1..count, v = "v<k>",
    * cents = k*10; returns (sql name, filesystem root). `delta = true`
    * declares the dml.mode=delta table property (the not-null-key
    * contract) at creation.
    */
  private def freshTable(count: Int = 40, buckets: Int = 4,
                         delta: Boolean = false): (String, String) = {
    n += 1
    val t = s"t$n"
    val deltaProp = if (delta) ", 'dml.mode'='delta'" else ""
    (1 to count).map(k => (k.toLong, s"v$k", k * 10L))
      .toDF("k", "v", "cents").createOrReplaceTempView(s"rl_src_$n")
    spark.sql(
      s"""CREATE TABLE rl.ns.$t USING graft
         |TBLPROPERTIES ('keys'='k', 'numBuckets'='$buckets', 'statsCols'='k,cents'$deltaProp)
         |AS SELECT * FROM rl_src_$n""".stripMargin)
    (s"rl.ns.$t", s"$warehouse/ns/$t")
  }

  private def state(name: String): Set[(Long, String, Long)] =
    spark.table(name).as[(Long, String, Long)].collect().toSet

  private def manifest(root: String) =
    SnapshotStore.readManifest(spark, root,
      SnapshotStore.latestVersion(spark, root).get)

  test("SQL DELETE with translatable predicate takes the tombstone path (no rewrite)") {
    val (name, root) = freshTable()
    val before = manifest(root)
    spark.sql(s"DELETE FROM $name WHERE k <= 10 AND v LIKE 'v%'")
    val after = manifest(root)
    assert(state(name) == (11 to 40).map(k => (k.toLong, s"v$k", k * 10L)).toSet)
    // merge-on-read: every data dir pointer is UNCHANGED — the commit
    // wrote tombstone sidecars, not buckets
    assert(after.version == before.version + 1)
    for ((b, e) <- before.buckets)
      assert(after.buckets(b).dir == e.dir, s"bucket $b was rewritten")
    assert(after.buckets.values.exists(_.tombstones.nonEmpty))
    // time travel still sees the deleted rows
    assert(spark.read.format("graft").option("versionAsOf", before.version)
      .load(root).count() == 40)
  }

  test("SQL DELETE with a subquery condition takes the group-rewrite path") {
    val (name, root) = freshTable()
    val before = manifest(root)
    (1 to 10).map(_.toLong).toDF("dk").createOrReplaceTempView("rl_delkeys")
    spark.sql(s"DELETE FROM $name WHERE k IN (SELECT dk FROM rl_delkeys)")
    assert(state(name) == (11 to 40).map(k => (k.toLong, s"v$k", k * 10L)).toSet)
    val after = manifest(root)
    assert(after.version == before.version + 1)
    // the rewrite replaced the affected buckets — no tombstones here
    assert(after.buckets.values.forall(_.tombstones.isEmpty))
    // runtime group filtering: buckets holding NO deleted key keep
    // their pointer
    val touched = GraftFilters.bucketsOf((1L to 10L),
      org.apache.spark.sql.types.LongType, before.numBuckets)
    for ((b, e) <- before.buckets if !touched(b))
      assert(after.buckets(b).dir == e.dir, s"untouched bucket $b was rewritten")
  }

  test("subquery DELETE on a dml.mode=delta table stays merge-on-read, no conf set") {
    // the table PROPERTY alone drives the delta path — no session conf
    val (name, root) = freshTable(delta = true)
    assert(spark.conf.getOption("spark.graft.dml.mode").isEmpty)
    val before = manifest(root)
    (1 to 10).map(_.toLong).toDF("dk").createOrReplaceTempView("rl_delkeys2")
    spark.sql(s"DELETE FROM $name WHERE k IN (SELECT dk FROM rl_delkeys2)")
    assert(state(name) == (11 to 40).map(k => (k.toLong, s"v$k", k * 10L)).toSet)
    val after = manifest(root)
    assert(after.version == before.version + 1)
    // the delta path commits TOMBSTONES: no bucket rewrote even
    // though the condition was a subquery the metadata path can't
    // take
    for ((b, e) <- before.buckets)
      assert(after.buckets(b).dir == e.dir, s"bucket $b was rewritten")
    assert(after.buckets.values.exists(_.tombstones.nonEmpty))
  }

  test("dml.mode table property: conf overrides choice, contract is enforced") {
    // conf=cow on a delta-property table forces the CoW path — a
    // legal override (the rewrite, not the contract, changes)
    val (name, root) = freshTable(delta = true)
    spark.conf.set("spark.graft.dml.mode", "cow")
    try {
      (1 to 3).map(_.toLong).toDF("dk").createOrReplaceTempView("rl_ovr_keys")
      spark.sql(s"DELETE FROM $name WHERE k IN (SELECT dk FROM rl_ovr_keys)")
      // CoW group rewrite: no tombstones, affected buckets rewrote
      assert(manifest(root).buckets.values.forall(_.tombstones.isEmpty))
      assert(state(name).size == 37)
    } finally spark.conf.unset("spark.graft.dml.mode")
    // conf=delta on a table WITHOUT the property refuses with guidance:
    // only the recorded contract makes non-null row-ids truthful
    val (name2, _) = freshTable()
    spark.conf.set("spark.graft.dml.mode", "delta")
    try {
      (1 to 3).map(_.toLong).toDF("dk").createOrReplaceTempView("rl_ovr_keys2")
      val e = intercept[Exception](
        spark.sql(s"DELETE FROM $name2 WHERE k IN (SELECT dk FROM rl_ovr_keys2)"))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("dml.mode")), msgs(e).mkString(" | "))
    } finally spark.conf.unset("spark.graft.dml.mode")
    // the contract is real: a null merge key is rejected at write
    val e2 = intercept[Exception](
      spark.sql(s"INSERT INTO $name SELECT CAST(NULL AS BIGINT), 'x', 1"))
    assert(e2.getMessage != null)
    assert(state(name).size == 37, "failed insert must not land rows")
    // and SHOW TBLPROPERTIES surfaces the declared mode
    val props = spark.sql(s"SHOW TBLPROPERTIES $name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("dml.mode") == "delta")
  }

  test("UPDATE and MERGE on a dml.mode=delta table match the cow semantics") {
    val (name, root) = freshTable(delta = true)
      spark.sql(s"UPDATE $name SET v = 'upd', cents = cents + 1 WHERE k <= 5")
      assert(state(name) ==
        ((1 to 5).map(k => (k.toLong, "upd", k * 10L + 1)) ++
          (6 to 40).map(k => (k.toLong, s"v$k", k * 10L))).toSet)
      // key-moving update through the delta path: D(old id) + I(new row)
      spark.sql(s"UPDATE $name SET k = 4 WHERE k = 3")
      val afterMove = state(name)
      assert(afterMove.count(_._1 == 4L) == 1 && !afterMove.exists(_._1 == 3L)
        && afterMove.size == 39)
      // mixed MERGE: update/delete/insert in one delta commit
      Seq((6L, "m6", -1L, "U"), (7L, "", 0L, "D"), (300L, "new", 3000L, "I"))
        .toDF("k", "v", "cents", "op").createOrReplaceTempView("rl_delta_merge")
      spark.sql(
        s"""MERGE INTO $name t USING rl_delta_merge s ON t.k = s.k
           |WHEN MATCHED AND s.op = 'D' THEN DELETE
           |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT (k, v, cents) VALUES (s.k, s.v, s.cents)
           |""".stripMargin)
      val got = state(name)
      assert(got((6L, "m6", 60L)) && !got.exists(_._1 == 7L)
        && got((300L, "new", 3000L)) && got.size == 39)
    // the whole sequence rode tombstones + touched-bucket rewrites;
    // time travel still reaches every intermediate version
    assert(spark.read.format("graft").option("versionAsOf", 1)
      .load(root).count() == 40)
    // the delta path enforces the keyed-table contract exactly like
    // the cow path: an UPDATE mapping several keys onto one new key
    // refuses instead of landing two rows for that key
    val e = intercept[Exception](
      spark.sql(s"UPDATE $name SET k = 9999 WHERE k IN (10, 11)"))
    assert(e.getMessage != null &&
      (e.getMessage.contains("one row per key") ||
        Option(e.getCause).exists(_.getMessage.contains("one row per key"))),
      s"expected the duplicate-upsert-key guard, got: ${e.getMessage}")
    assert(!state(name).exists(_._1 == 9999L), "failed UPDATE must not land rows")
  }

  test("SQL UPDATE rewrites only the buckets holding matching rows") {
    val (name, root) = freshTable()
    val before = manifest(root)
    spark.sql(s"UPDATE $name SET v = 'upd', cents = cents + 1 WHERE k <= 5")
    assert(state(name) ==
      ((1 to 5).map(k => (k.toLong, "upd", k * 10L + 1)) ++
        (6 to 40).map(k => (k.toLong, s"v$k", k * 10L))).toSet)
    val after = manifest(root)
    val touched = GraftFilters.bucketsOf((1L to 5L),
      org.apache.spark.sql.types.LongType, before.numBuckets)
    for ((b, e) <- before.buckets if !touched(b))
      assert(after.buckets(b).dir == e.dir, s"untouched bucket $b was rewritten")
    // the write requests clustering by target bucket, so every
    // rewritten bucket lands as ONE file (no immediate compaction debt)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (b <- touched if after.buckets.contains(b)) {
      val dir = new org.apache.hadoop.fs.Path(root, after.buckets(b).dir)
      val files = fs.listStatus(dir).count(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      assert(files == 1, s"rewritten bucket $b holds $files files")
    }
  }

  test("SQL UPDATE moving a key between buckets keeps the keyed-table invariant") {
    val (name, root) = freshTable()
    // k = 3 → k = 303 (different bucket with high probability at 4
    // buckets; the invariant must hold either way), and 303 collides
    // with nothing
    spark.sql(s"UPDATE $name SET k = 303 WHERE k = 3")
    val got = state(name)
    assert(!got.exists(_._1 == 3L) && got((303L, "v3", 30L)) && got.size == 40)
    // updating a key ONTO an existing key: the upsert invariant keeps
    // one row per key (last write wins on the moved row)
    spark.sql(s"UPDATE $name SET k = 4 WHERE k = 303")
    val got2 = state(name)
    assert(got2.count(_._1 == 4L) == 1 && got2.size == 39)
  }

  test("SQL MERGE INTO: mixed update/delete/insert, one atomic version") {
    val (name, root) = freshTable()
    val before = manifest(root)
    // source: update k<=4 (op U), delete k in 11..12 (op D), insert
    // k=101,102 (op I)
    ((1 to 4).map(k => (k.toLong, "merged", -1L, "U")) ++
      Seq((11L, "", 0L, "D"), (12L, "", 0L, "D")) ++
      Seq((101L, "new", 1010L, "I"), (102L, "new", 1020L, "I")))
      .toDF("k", "v", "cents", "op").createOrReplaceTempView("rl_merge_src")
    spark.sql(
      s"""MERGE INTO $name t USING rl_merge_src s ON t.k = s.k
         |WHEN MATCHED AND s.op = 'D' THEN DELETE
         |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET v = s.v, cents = t.cents + 1
         |WHEN NOT MATCHED THEN INSERT (k, v, cents) VALUES (s.k, s.v, s.cents)
         |""".stripMargin)
    val expected =
      ((1 to 4).map(k => (k.toLong, "merged", k * 10L + 1)) ++
        (5 to 40).filterNot(k => k == 11 || k == 12)
          .map(k => (k.toLong, s"v$k", k * 10L)) ++
        Seq((101L, "new", 1010L), (102L, "new", 1020L))).toSet
    assert(state(name) == expected)
    val after = manifest(root)
    assert(after.version == before.version + 1) // ONE commit for all three verbs
    // runtime group filtering: buckets with no matched key and no
    // insert keep their pointers
    val touched = GraftFilters.bucketsOf(
      Seq(1L, 2L, 3L, 4L, 11L, 12L, 101L, 102L),
      org.apache.spark.sql.types.LongType, before.numBuckets)
    for ((b, e) <- before.buckets if !touched(b))
      assert(after.buckets(b).dir == e.dir, s"untouched bucket $b was rewritten")
  }

  test("SQL MERGE with NOT MATCHED BY SOURCE rewrites against the full group set") {
    val (name, _) = freshTable(count = 20)
    // source holds only even keys: evens update, odds (absent from the
    // source) must DELETE — which forces every bucket into the scan
    // (no runtime narrowing is sound when unmatched targets act)
    (2 to 20 by 2).map(k => (k.toLong, s"m$k")).toDF("k", "nv")
      .createOrReplaceTempView("rl_nbs_src")
    spark.sql(
      s"""MERGE INTO $name t USING rl_nbs_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.nv
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(state(name) ==
      (2 to 20 by 2).map(k => (k.toLong, s"m$k", k * 10L)).toSet)
  }

  test("group rewrite deleting every key of a bucket empties it out of the manifest") {
    val (name, root) = freshTable(count = 40, buckets = 4)
    val before = manifest(root)
    // delete ALL keys hashing into bucket 0 — via a subquery so the
    // group-rewrite path (not the tombstone path) runs
    val allKeys = (1L to 40L)
    val b0keys = allKeys.filter(k => GraftFilters.bucketsOf(Seq(k),
      org.apache.spark.sql.types.LongType, before.numBuckets).head == 0)
    assert(b0keys.nonEmpty)
    b0keys.toDF("dk").createOrReplaceTempView("rl_empty_src")
    spark.sql(s"DELETE FROM $name WHERE k IN (SELECT dk FROM rl_empty_src)")
    val after = manifest(root)
    assert(!after.buckets.contains(0), "emptied bucket should drop from the manifest")
    assert(state(name) == allKeys.filterNot(b0keys.contains)
      .map(k => (k, s"v$k", k * 10L)).toSet)
    // and the table keeps working: a later insert re-creates the bucket
    spark.sql(s"INSERT INTO $name VALUES (${b0keys.head}, 'back', 1)")
    assert(manifest(root).buckets.contains(0))
  }

  test("row-level ops hold on composite merge keys") {
    n += 1
    val t = s"t$n"
    (1 to 30).map(k => (k.toLong % 5, s"s$k", k * 10L))
      .toDF("k1", "k2", "cents").createOrReplaceTempView(s"rl_ck_src_$n")
    spark.sql(
      s"""CREATE TABLE rl.ns.$t USING graft
         |TBLPROPERTIES ('keys'='k1,k2', 'numBuckets'='4')
         |AS SELECT * FROM rl_ck_src_$n""".stripMargin)
    val name = s"rl.ns.$t"
    // MERGE keyed on both columns: update one identity, insert another
    Seq((1L, "s1", -1L, "U"), (9L, "brand-new", 999L, "I"))
      .toDF("k1", "k2", "cents", "op").createOrReplaceTempView("rl_ck_merge")
    spark.sql(
      s"""MERGE INTO $name t USING rl_ck_merge s
         |ON t.k1 = s.k1 AND t.k2 = s.k2
         |WHEN MATCHED THEN UPDATE SET cents = t.cents + 1
         |WHEN NOT MATCHED THEN INSERT (k1, k2, cents) VALUES (s.k1, s.k2, s.cents)
         |""".stripMargin)
    val got = spark.table(name).as[(Long, String, Long)].collect().toSet
    val expected = (1 to 30).map { k =>
      val base = (k.toLong % 5, s"s$k", k * 10L)
      if (base._1 == 1L && base._2 == "s1") (base._1, base._2, base._3 + 1) else base
    }.toSet + ((9L, "brand-new", 999L))
    assert(got == expected)
    // tombstone DELETE on a composite-key predicate
    spark.sql(s"DELETE FROM $name WHERE k1 = 9 AND k2 = 'brand-new'")
    assert(spark.table(name).count() == 30)
  }

  test("delta-mode MERGE rewrites only the matched keys' buckets") {
    val (name, root) = freshTable(count = 400, buckets = 8, delta = true)
    val before = manifest(root)
    spark.range(1L, 401L).toDF("sk").where(col("sk") % 100 === 0)
      .createOrReplaceTempView("rl_dpp_src")
    spark.sql(
      s"""MERGE INTO $name t USING rl_dpp_src s ON t.k = s.sk
         |WHEN MATCHED THEN UPDATE SET v = 'dpp'""".stripMargin)
    val got = state(name)
    assert(got.count(_._2 == "dpp") == 4) // keys 100, 200, 300, 400
    assert(got.size == 400)
    // the delta commit's scope is the CHANGED rows' buckets — every
    // bucket holding no matched key kept its pointer (at scale this
    // is what bounds a selective MERGE's rewrite to the touched
    // slice, with no dependence on runtime group filtering)
    val after = manifest(root)
    val touched = GraftFilters.bucketsOf(Seq(100L, 200L, 300L, 400L),
      org.apache.spark.sql.types.LongType, before.numBuckets)
    for ((b, e) <- before.buckets if !touched(b))
      assert(after.buckets(b).dir == e.dir, s"untouched bucket $b was rewritten")
  }

  test("delta DML works on a table whose merge key is named 'count'") {
    // the duplicate-key guard aggregates over the upserts — a literal
    // `.count()` there would collide with a merge key of that name
    // (AMBIGUOUS_REFERENCE) and break every delta statement on the table
    spark.sql("""CREATE TABLE rl.ns.cntkey (count BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='count',
                   'numBuckets'='2', 'dml.mode'='delta')""")
    spark.sql("INSERT INTO rl.ns.cntkey VALUES (1, 'a'), (2, 'b')")
    spark.sql("UPDATE rl.ns.cntkey SET v = 'u' WHERE count = 1")
    assert(spark.table("rl.ns.cntkey").as[(Long, String)].collect().toSet ==
      Set((1L, "u"), (2L, "b")))
    // and the guard still fires for a REAL duplicate (two keys mapped
    // onto one)
    val e = intercept[Exception](spark.sql(
      "UPDATE rl.ns.cntkey SET count = 9"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("two rows for one"))))
  }

  test("SQL MERGE INTO rejects duplicate source matches (cardinality check)") {
    val (name, _) = freshTable()
    Seq((1L, "a", 1L), (1L, "b", 2L)).toDF("k", "v", "cents")
      .createOrReplaceTempView("rl_dup_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $name t USING rl_dup_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("merge") ||
      e.getMessage.toLowerCase.contains("cardinality"))
  }

  test("unconditioned SQL DELETE empties the table as one version") {
    val (name, root) = freshTable()
    val v0 = manifest(root).version
    spark.sql(s"DELETE FROM $name")
    assert(spark.table(name).count() == 0)
    assert(manifest(root).version == v0 + 1)
    assert(manifest(root).buckets.isEmpty)
    // and it composes: an insert after the truncate works
    spark.sql(s"INSERT INTO $name VALUES (1, 'again', 10)")
    assert(state(name) == Set((1L, "again", 10L)))
  }

  test("filter-scoped overwrite: one commit, non-matching buckets untouched") {
    val (name, root) = freshTable()
    val before = manifest(root)
    // overwrite the k <= 10 slice with two replacement rows
    Seq((1L, "ow", 1L), (2L, "ow", 2L)).toDF("k", "v", "cents")
      .writeTo(name).overwrite(col("k") <= 10)
    assert(state(name) ==
      ((11 to 40).map(k => (k.toLong, s"v$k", k * 10L)) ++
        Seq((1L, "ow", 1L), (2L, "ow", 2L))).toSet)
    val after = manifest(root)
    assert(after.version == before.version + 1)
    // k is a stats column: buckets whose k-range sits above 10 and
    // that received no replacement rows keep their pointers
    val replBuckets = GraftFilters.bucketsOf(Seq(1L, 2L),
      org.apache.spark.sql.types.LongType, before.numBuckets)
    val candidates = GraftFilters.candidateBuckets(before,
      Seq(org.apache.spark.sql.sources.LessThanOrEqual("k", 10L)))
    for ((b, e) <- before.buckets if !candidates(b) && !replBuckets(b))
      assert(after.buckets(b).dir == e.dir, s"untouched bucket $b was rewritten")
    assert(candidates.size < before.buckets.size ||
      before.buckets.size <= 2, "stats pruning should narrow the overwrite")
  }

  test("timestampAsOf read option resolves from in-commit timestamps") {
    val (name, root) = freshTable()
    val v1 = SnapshotStore.latestVersion(spark, root).get
    val t1 = SnapshotStore.commitTimeMillis(spark, root, v1)
    spark.sql(s"DELETE FROM $name WHERE k <= 30")
    assert(spark.table(name).count() == 10)
    // epoch-millis form pins the pre-delete snapshot
    assert(spark.read.format("graft").option("timestampAsOf", t1.toString)
      .load(root).count() == 40)
    // a timestamp before the table existed refuses with guidance
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft").option("timestampAsOf", "1970-01-02")
        .load(root).count())
    assert(e.getMessage.contains("no graft version"))
  }

  test("SHOW TBLPROPERTIES surfaces the manifest's layout facts") {
    val (name, _) = freshTable(buckets = 4)
    val props = spark.sql(s"SHOW TBLPROPERTIES $name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("keys") == "k")
    assert(props("numBuckets") == "4")
    assert(props("statsCols") == "k,cents")
    assert(props("version") == "1") // CTAS = empty create (v0) + data (v1)
  }

  test("row-level rewrite against a concurrently-modified bucket refuses") {
    val (name, root) = freshTable()
    // plant a conflicting commit BETWEEN the scan and the write by
    // racing on the same keys: simulate with a manual stale-version
    // replaceBuckets (the connector path resolves scan + write within
    // one statement, so the window is exercised at the store level)
    val m0 = manifest(root)
    val touched = GraftFilters.bucketsOf(Seq(1L),
      org.apache.spark.sql.types.LongType, m0.numBuckets)
    // concurrent writer updates k=1 (same bucket the "scan" read)
    Seq((1L, "winner", 999L)).toDF("k", "v", "cents")
      .write.format("graft").mode("append").save(root)
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.replaceBuckets(spark, root, touched,
        Seq((1L, "loser", 0L)).toDF("k", "v", "cents"), Seq("k"),
        basedOnVersion = Some(m0.version))
    }
    assert(e.getMessage.contains("stale"))
    assert(state(name)((1L, "winner", 999L)))
  }

  test("delta pure-DELETE against a concurrently-modified bucket refuses") {
    // the delta path's tombstone commit carries the scan's snapshot
    // version: a winner that replaced a to-be-deleted row between the
    // scan and the commit must surface as a conflict — silently
    // tombstoning it would drop the winner's update
    val (name, root) = freshTable(delta = true)
    val m0 = manifest(root)
    // concurrent writer replaces k=1 after "our scan" (m0)
    Seq((1L, "winner", 999L)).toDF("k", "v", "cents")
      .write.format("graft").mode("append").save(root)
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commitDeletes(spark, root, Seq(1L).toDF("k"), Seq("k"),
        basedOnVersion = Some(m0.version))
    }
    assert(e.getMessage.contains("stale"))
    assert(state(name)((1L, "winner", 999L)))
    // without a version pin (the declarative deleteWhere path, which
    // recomputes its matching keys per attempt) the commit proceeds
    SnapshotStore.commitDeletes(spark, root, Seq(1L).toDF("k"), Seq("k"))
    assert(!state(name).exists(_._1 == 1L))
  }

  test("filter-scoped overwrite keeps rows where the condition is NULL") {
    // three-valued logic: a row whose condition evaluates to NULL does
    // NOT match the overwrite scope and must survive (deleteWhere
    // already behaves this way — where(cond) keeps non-TRUE rows)
    n += 1
    val t = s"t$n"
    spark.sql(
      s"""CREATE TABLE rl.ns.$t (k BIGINT, v STRING) USING graft
         |TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""".stripMargin)
    val name = s"rl.ns.$t"
    spark.sql(s"INSERT INTO $name VALUES (1, 'x'), (2, 'y'), (3, NULL)")
    Seq((10L, "repl")).toDF("k", "v").writeTo(name).overwrite(col("v") === "x")
    val got = spark.table(name).as[(Long, String)].collect().toSet
    assert(got == Set((2L, "y"), (3L, null), (10L, "repl")),
      s"NULL-evaluating row must survive the scoped overwrite, got $got")
  }
}
