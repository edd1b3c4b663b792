package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.connector.catalog.Identifier

import graft.SparkSpec
import graft.store.SnapshotStore

/** Contract time travel below a REPLACE epoch, and restore across one.
  *
  * Each `REPLACE TABLE` archives the contracts it displaces —
  * `_schema_upto_<v>` (since r11) AND `_props_upto_<v>` / the identity
  * ledger (r12) — under the last version they governed. An auditor
  * asking "what CHECK constraint / DEFAULT / identity spec held at
  * version v" through a `VERSION AS OF` resolution must get THAT
  * epoch's answer, not the replacement's (the reference redefines
  * objects with CREATE OR REPLACE constantly —
  * `01 Create DB+Schema.sql:43-60`, `with procedures/order_proc.sql:1`).
  *
  * And [[SnapshotStore.restore]] below an epoch boundary is a contract
  * swap, not just a data swap: the restored head must read, write and
  * report under the contracts its data was written with — keys revert
  * (old-keyed buckets declared under new keys would hash upserts into
  * the wrong buckets, duplicating logical keys), props/schema/identity
  * ledger re-install from their archive, and the epoch re-stamps so
  * every pre-restore version still resolves its own epoch's archives.
  */
class EpochContractsSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-epoch").toString
  locally {
    spark.conf.set("spark.sql.catalog.gep", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gep.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gep.ns")
  }

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("gep").asInstanceOf[GraftCatalog]
  private def tableAt(name: String, v: Long) =
    cat.loadTable(Identifier.of(Array("ns"), name), v.toString)

  test("CHECK + DEFAULT + identity contracts below a REPLACE epoch report their own epoch") {
    spark.sql("""CREATE TABLE gep.ns.c (
                   sk BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
                   k BIGINT, cents BIGINT DEFAULT 7,
                   CONSTRAINT non_negative CHECK (cents >= 0))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.c (k, cents) VALUES (1, 5)")
    val dir = s"$warehouse/ns/c"
    val vBefore = SnapshotStore.latestVersion(spark, dir).get

    spark.sql("""REPLACE TABLE gep.ns.c
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2') AS
                 SELECT 1 AS k, CAST(-50 AS BIGINT) AS cents""")
    spark.sql("ALTER TABLE gep.ns.c ADD CONSTRAINT cap CHECK (cents <= 100)")

    // the CURRENT table reports the replacement's contracts
    val now = cat.loadTable(Identifier.of(Array("ns"), "c"))
    val nowChecks = now.constraints().map(_.name()).toSet
    assert(nowChecks == Set("cap"), s"current constraints: $nowChecks")
    assert(!now.properties().containsKey("constraint.check.non_negative"))

    // a resolution pinned BELOW the epoch reports ITS epoch's contracts
    val old = tableAt("c", vBefore)
    val oldChecks = old.constraints().map(_.name()).toSet
    assert(oldChecks == Set("non_negative"), s"pinned constraints: $oldChecks")
    assert(old.properties().containsKey("constraint.check.non_negative"))
    assert(!old.properties().containsKey("constraint.check.cap"))
    // the identity declaration and the DEFAULT travel too (columns()
    // renders from the archived props/schema, not the replacement's)
    val skCol = old.columns().find(_.name == "sk").get
    assert(skCol.identityColumnSpec() != null &&
      skCol.identityColumnSpec().getStart == 10 && skCol.identityColumnSpec().getStep == 2)
    assert(now.columns().find(_.name == "sk").forall(_.identityColumnSpec() == null))
    // the DEFAULT rides the archived schema's field metadata
    val centsOld = old.schema()("cents")
    assert(centsOld.metadata.contains("CURRENT_DEFAULT") &&
      centsOld.metadata.getString("CURRENT_DEFAULT") == "7",
      s"cents metadata below the epoch: ${centsOld.metadata}")
  }

  test("an ALL-EMPTY pre-epoch version answers with its own archived schema on the programmatic read path") {
    // GraftTable.schema already resolved pinned pre-epoch reads through
    // the archive (r13, found at version 0 by ContractFuzzSpec) — but
    // SnapshotStore.readVersion of an all-empty old-epoch version went
    // through emptyWithSchema, which consulted the LIVE `_schema`
    // first: the replacement epoch's columns leaked into a version that
    // never held them. The store path must consult archivedSchemaFor
    // whenever the pinned manifest predates the live schema epoch.
    spark.sql("""CREATE TABLE gep.ns.es (a BIGINT, b STRING) USING graft
                 TBLPROPERTIES ('keys'='a', 'numBuckets'='2')""") // v0: empty
    spark.sql("""REPLACE TABLE gep.ns.es
                 TBLPROPERTIES ('keys'='c', 'numBuckets'='2') AS
                 SELECT CAST(1 AS BIGINT) AS c, CAST(2 AS BIGINT) AS d""")
    val dir = s"$warehouse/ns/es"
    val v0 = SnapshotStore.readVersion(spark, dir, 0L)
    assert(v0.schema.fieldNames.toSeq == Seq("a", "b"),
      s"empty pre-epoch version leaked the replacement's schema: ${v0.schema.treeString}")
    assert(v0.count() == 0L)
    // the live head still answers under the replacement's declarations
    assert(SnapshotStore.read(spark, dir).schema.fieldNames.toSeq == Seq("c", "d"))
  }

  test("restore across a keys-changing REPLACE reverts keys: upserts keep deduping") {
    spark.sql("""CREATE TABLE gep.ns.r (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='4')""")
    spark.sql("INSERT INTO gep.ns.r SELECT id, CAST(id AS STRING) FROM range(20)")
    val dir = s"$warehouse/ns/r"
    val vBefore = SnapshotStore.latestVersion(spark, dir).get

    spark.sql("""REPLACE TABLE gep.ns.r TBLPROPERTIES ('keys'='g', 'numBuckets'='2') AS
                 SELECT id % 2 AS g, CAST(count(*) AS STRING) AS v
                 FROM range(20) GROUP BY id % 2""")
    spark.sql(s"CALL gep.system.restore(table => 'ns.r', version => $vBefore)")

    val m = SnapshotStore.readManifest(spark, dir,
      SnapshotStore.latestVersion(spark, dir).get)
    assert(m.keys == Seq("k"), s"restored manifest keys: ${m.keys}")
    assert(m.numBuckets == 4)
    // the regression this pins: with the restored buckets declared
    // under the replacement's keys ('g'), this upsert would hash k=3
    // into a bucket that doesn't hold it — landing a DUPLICATE row
    spark.sql("INSERT INTO gep.ns.r VALUES (3, 'updated')")
    val rows = spark.table("gep.ns.r").as[(Long, String)].collect()
    assert(rows.length == 20, s"logical key duplicated: ${rows.length} rows")
    assert(rows.toMap.get(3L).contains("updated"))
  }

  test("restore below the epoch re-installs that epoch's contracts and re-stamps") {
    spark.sql("""CREATE TABLE gep.ns.e (
                   sk BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
                   k BIGINT,
                   CONSTRAINT pos CHECK (k > 0))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.e (k) SELECT id + 1 FROM range(30)")
    val dir = s"$warehouse/ns/e"
    val vBefore = SnapshotStore.latestVersion(spark, dir).get
    val maxSkBefore = spark.table("gep.ns.e").agg("sk" -> "max")
      .as[Long].head()

    spark.sql("""REPLACE TABLE gep.ns.e TBLPROPERTIES ('keys'='k') AS
                 SELECT CAST(-1 AS BIGINT) AS k""")
    val vReplaced = SnapshotStore.latestVersion(spark, dir).get
    spark.sql(s"CALL gep.system.restore(table => 'ns.e', version => $vBefore)")
    val vRestored = SnapshotStore.latestVersion(spark, dir).get

    // current contracts are the restored epoch's own, epoch re-stamped
    // at the new head (pre-restore versions keep their archives)
    val props = SnapshotStore.readProps(spark, dir)
    assert(props.contains("constraint.check.pos"), s"props after restore: $props")
    assert(props.get("graft.schema.epoch").contains(vRestored.toString))
    // ... and write-ENFORCED again on the restored head
    val rejected = intercept[Exception] {
      spark.sql("INSERT INTO gep.ns.e (k) VALUES (-5)")
    }
    assert(rejected.toString.contains("pos") ||
      (rejected.getCause != null && rejected.getCause.toString.contains("pos")),
      s"unexpected rejection shape: $rejected")

    // identity resumes ABOVE the restored data's high-water (the
    // archived ledger re-installed — ids are never re-minted)
    spark.sql("INSERT INTO gep.ns.e (k) VALUES (999)")
    val sks = spark.table("gep.ns.e").select("sk").as[Long].collect()
    assert(sks.length == 31 && sks.toSet.size == 31,
      s"identity re-minted after restore: ${sks.length} rows, ${sks.toSet.size} ids")
    assert(sks.max > maxSkBefore)

    // the replaced-away middle epoch still reports ITS contracts
    val mid = tableAt("e", vReplaced)
    assert(mid.constraints().isEmpty,
      s"middle epoch leaked contracts: ${mid.constraints().map(_.name()).toSeq}")
    assert(spark.sql(s"SELECT k FROM gep.ns.e VERSION AS OF $vReplaced")
      .as[Long].collect().toSeq == Seq(-1L))
    // ... and the pre-replace epoch below the restore still reports its own
    val oldT = tableAt("e", vBefore)
    assert(oldT.constraints().map(_.name()).toSet == Set("pos"))
  }

  test("a SECOND cross-epoch restore still finds its epoch's ledger (install by copy)") {
    // Epoch A reserves two identity blocks (one per insert); epoch B
    // (the REPLACE) has its OWN ledger, whose frontier sits exactly
    // where A's SECOND block starts (both advanced by one `n<<33`
    // span from the same START). The first cross-epoch restore must
    // install A's archived ledger WITHOUT consuming the archive: a
    // second restore into epoch A re-enters the cross-epoch path, and
    // if A's archive is gone, smallest-n≥v resolves to B's (later)
    // archive — installing B's frontier, so the next insert re-mints
    // the very ids A's second block already handed to the restored
    // rows (silent duplicates).
    spark.sql("""CREATE TABLE gep.ns.dd (
                   sk BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
                   k BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.dd (k) SELECT id FROM range(10)")
    val dir = s"$warehouse/ns/dd"
    spark.sql("INSERT INTO gep.ns.dd (k) SELECT id + 10 FROM range(10)")
    val v2 = SnapshotStore.latestVersion(spark, dir).get

    spark.sql("""REPLACE TABLE gep.ns.dd (
                   sk BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
                   k BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.dd (k) SELECT id + 100 FROM range(10)")

    spark.sql(s"CALL gep.system.restore(table => 'ns.dd', version => $v2)")
    spark.sql("INSERT INTO gep.ns.dd (k) VALUES (200)") // A's third block
    val afterFirst = spark.table("gep.ns.dd").select("sk").as[Long].collect()
    assert(afterFirst.length == 21 && afterFirst.toSet.size == 21,
      s"first restore re-minted: ${afterFirst.sorted.toSeq}")

    spark.sql(s"CALL gep.system.restore(table => 'ns.dd', version => $v2)")
    // head again holds v2's 20 rows, whose second half minted from A's
    // second block. This insert repeats the second insert's row
    // distribution: under B's frontier it would reproduce those exact
    // ids — base + (partition<<33) + row — colliding with live rows
    spark.sql("INSERT INTO gep.ns.dd (k) SELECT id + 30 FROM range(10)")
    val sks = spark.table("gep.ns.dd").select("sk").as[Long].collect()
    assert(sks.length == 30 && sks.toSet.size == 30,
      s"second cross-epoch restore re-minted ids: ${sks.length} rows, ${sks.toSet.size} distinct")
  }

  test("cross-epoch restore into a no-ledger epoch installs NO ledger (lookup precedes archival)") {
    // Epoch A has no identity column (no ledger); epoch B does. The
    // restore back to A archives B's live ledger under the displaced
    // base — if the install lookup ran AFTER that archival, it would
    // pick the file this very restore just wrote (no earlier archive
    // exists for A) and install B's allocator on a head whose schema
    // has no identity columns at all.
    spark.sql("""CREATE TABLE gep.ns.nl (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.nl VALUES (1, 'a'), (2, 'b')")
    val dir = s"$warehouse/ns/nl"
    val vA = SnapshotStore.latestVersion(spark, dir).get

    spark.sql("""REPLACE TABLE gep.ns.nl (
                   sk BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
                   k BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.nl (k) VALUES (10), (11)") // B's live ledger
    val vB = SnapshotStore.latestVersion(spark, dir).get

    spark.sql(s"CALL gep.system.restore(table => 'ns.nl', version => $vA)")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_identity")),
      "restored no-identity epoch must carry no live ledger")
    // B's ledger is archived, not lost: travel to the replaced-away
    // epoch still reports its identity declaration and data
    val midRows = spark.sql(s"SELECT sk FROM gep.ns.nl VERSION AS OF $vB")
      .as[Long].collect().toSet
    assert(midRows.size == 2, s"epoch B rows under VERSION AS OF: $midRows")
    // and the restored head is plain epoch-A data
    assert(spark.table("gep.ns.nl").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("a cross-epoch restore crashing mid-swap is healed by the next " +
      "contract op from its write-ahead bundle") {
    spark.sql("""CREATE TABLE gep.ns.f (
                   sk BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
                   k BIGINT,
                   CONSTRAINT pos CHECK (k > 0))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.f (k) SELECT id + 1 FROM range(10)")
    val dir = s"$warehouse/ns/f"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vBefore = SnapshotStore.latestVersion(spark, dir).get
    spark.sql("""REPLACE TABLE gep.ns.f TBLPROPERTIES ('keys'='k') AS
                 SELECT CAST(-1 AS BIGINT) AS k""")
    val vReplaced = SnapshotStore.latestVersion(spark, dir).get

    // the restore commits its manifest, then "crashes" before its swap
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.replaceSwapHook = (root, _) =>
      if (root.endsWith("/ns/f") && crashed.compareAndSet(false, true))
        throw new RuntimeException("simulated crash post-commit pre-swap")
    try {
      val boom = intercept[Exception] {
        spark.sql(s"CALL gep.system.restore(table => 'ns.f', version => $vBefore)")
      }
      assert(boom.toString.contains("simulated crash") ||
        (boom.getCause != null && boom.getCause.toString.contains("simulated crash")))
    } finally SnapshotStore.replaceSwapHook = (_, _) => ()
    val vRestored = SnapshotStore.latestVersion(spark, dir).get
    assert(vRestored == vReplaced + 1, "the restore's manifest DID commit")
    // torn: data rolled back, contracts still the replacement epoch's
    assert(SnapshotStore.readProps(spark, dir)("graft.schema.epoch").toLong
      == vReplaced)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir)).exists(
      _.getPath.getName.startsWith("_pending_contracts-")))

    // the next contract op (a REPLACE) heals the crashed restore's
    // swap from its bundle, then completes its own
    System.setProperty("graft.snapshot.contractSwapGraceMs", "200")
    try {
      spark.sql("""REPLACE TABLE gep.ns.f TBLPROPERTIES ('keys'='g') AS
                   SELECT CAST(7 AS BIGINT) AS g""")
    } finally System.clearProperty("graft.snapshot.contractSwapGraceMs")

    // head is the new replacement...
    assert(spark.table("gep.ns.f").columns.toSeq == Seq("g"))
    assert(SnapshotStore.readProps(spark, dir)("graft.schema.epoch").toLong
      == vRestored + 1)
    // ...and the healed restore head (vRestored) time-travels under the
    // ORIGINAL epoch's contracts — the heal installed them per the
    // bundle, and the healer's own REPLACE archived them under vRestored
    assert(tableAt("f", vRestored).constraints().map(_.name()).toSet
      == Set("pos"), "healed restore head must carry its epoch's CHECK")
    assert(spark.sql(s"SELECT count(*) FROM gep.ns.f VERSION AS OF $vRestored")
      .as[Long].head() == 10L)
    assert(tableAt("f", vReplaced).constraints().isEmpty,
      "the replaced-away middle epoch stays contract-free")
    // bundles consumed
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(dir)).exists(
      _.getPath.getName.startsWith("_pending_contracts-")))
  }

  test("a ledger install crashing MID-COPY is redone by the healer, not " +
      "accepted: the completion certificate closes the torn-directory window") {
    // The ledger install is a MULTI-FILE copy — the one swap step a
    // single atomic write cannot cover. Pre-R14 the heal guard was
    // fs.exists(live): a crash mid-copy left a full-LOOKING directory
    // missing some blocks, the healer accepted it, and the allocator
    // frontier fell below already-minted ids — the next INSERT would
    // re-mint them. The per-directory certificate (written strictly
    // last) makes the healer REDO the torn install from its source.
    spark.sql("""CREATE TABLE gep.ns.lt (
                   sk BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
                   k BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.lt (k) SELECT id + 1 FROM range(20)")
    val dir = s"$warehouse/ns/lt"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vBefore = SnapshotStore.latestVersion(spark, dir).get
    val maxSkBefore = spark.table("gep.ns.lt").agg("sk" -> "max").as[Long].head()
    spark.sql("""REPLACE TABLE gep.ns.lt TBLPROPERTIES ('keys'='k') AS
                 SELECT CAST(-1 AS BIGINT) AS k""")

    // cross-epoch restore: its swap re-installs the archived ledger by
    // copy; the hook tears the copy (drops one block file) and crashes
    // before the certificate lands — exactly a mid-copy process death
    val live = new org.apache.hadoop.fs.Path(dir, "_identity")
    val torn = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.ledgerMoveHook = dst =>
      if (dst.toString.endsWith("/ns/lt/_identity") &&
          torn.compareAndSet(false, true)) {
        val blocks = fs.listStatus(new org.apache.hadoop.fs.Path(dst, "sk"))
          .map(_.getPath).filter(_.getName.startsWith("block-"))
        assert(blocks.nonEmpty, "expected copied block files to tear")
        fs.delete(blocks.maxBy(_.getName), false)
        throw new RuntimeException("simulated crash mid-ledger-copy")
      }
    try {
      val boom = intercept[Exception] {
        spark.sql(s"CALL gep.system.restore(table => 'ns.lt', version => $vBefore)")
      }
      assert(boom.toString.contains("mid-ledger-copy") ||
        (boom.getCause != null && boom.getCause.toString.contains("mid-ledger-copy")))
    } finally SnapshotStore.ledgerMoveHook = _ => ()
    val vRestored = SnapshotStore.latestVersion(spark, dir).get
    // torn state: live ledger EXISTS (the exists-guard trap) but is
    // uncertified and missing a block; the bundle is still on disk
    assert(fs.exists(live) &&
      !fs.exists(new org.apache.hadoop.fs.Path(live, "_installed_by")))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir)).exists(
      _.getPath.getName.startsWith("_pending_contracts-")))

    // any contract op heals the crashed swap first; the torn install
    // must be REDONE from the archive, not accepted
    System.setProperty("graft.snapshot.contractSwapGraceMs", "200")
    try spark.sql("ALTER TABLE gep.ns.lt SET TBLPROPERTIES ('healed'='1')")
    finally System.clearProperty("graft.snapshot.contractSwapGraceMs")
    assert(SnapshotStore.readProps(spark, dir)("graft.schema.epoch").toLong
      == vRestored, "heal must complete the restore's swap")
    // certificate present and naming the restore's version
    val cert = new org.apache.hadoop.fs.Path(live, "_installed_by")
    assert(fs.exists(cert), "healed install must be certified")
    // the dropped block is back: live block set == archived block set
    val arch = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.startsWith("_identity_upto_"))
      .minBy(_.getName)
    def blockSet(p: org.apache.hadoop.fs.Path): Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(p, "sk"))
        .map(_.getPath.getName).filter(_.startsWith("block-")).toSet
    assert(blockSet(live) == blockSet(arch),
      s"healed ledger incomplete: live ${blockSet(live)} vs archive ${blockSet(arch)}")
    // and the allocator never re-mints: fresh ids land strictly above
    spark.sql("INSERT INTO gep.ns.lt (k) VALUES (777)")
    val sks = spark.table("gep.ns.lt").select("sk").as[Long].collect()
    assert(sks.length == 21 && sks.toSet.size == 21,
      s"identity re-minted after torn-install heal: ${sks.length} rows, ${sks.toSet.size} ids")
    assert(sks.max > maxSkBefore)
  }

  test("a tag pinned ABOVE a cross-epoch restore target keeps resolving its own epoch") {
    // Tag a version in the REPLACEMENT epoch, then restore BELOW the
    // epoch: the tag must keep reading the replacement's data AND
    // reporting the replacement's contracts — the restore displaced
    // that epoch to the archives, it did not rewrite history.
    spark.sql("""CREATE TABLE gep.ns.tg (k BIGINT, cents BIGINT,
                   CONSTRAINT a_pos CHECK (cents >= 0))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.tg VALUES (1, 5)")
    val dir = s"$warehouse/ns/tg"
    val vA = SnapshotStore.latestVersion(spark, dir).get

    spark.sql("""REPLACE TABLE gep.ns.tg (k BIGINT, cents BIGINT,
                   CONSTRAINT b_cap CHECK (cents <= 100))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.tg VALUES (7, 70), (8, 80)")
    val vB = SnapshotStore.latestVersion(spark, dir).get
    spark.sql(s"CALL gep.system.tag(table => 'ns.tg', name => 'brel', version => $vB)")

    spark.sql(s"CALL gep.system.restore(table => 'ns.tg', version => $vA)")
    // head is epoch A again (contracts + data)
    val headChecks = cat.loadTable(Identifier.of(Array("ns"), "tg"))
      .constraints().map(_.name()).toSet
    assert(headChecks == Set("a_pos"), s"restored head constraints: $headChecks")
    assert(spark.table("gep.ns.tg").as[(Long, Long)].collect().toSet ==
      Set((1L, 5L)))
    // the tag still reads epoch B's data through every door...
    assert(spark.sql("SELECT k FROM gep.ns.tg VERSION AS OF 'brel'")
      .as[Long].collect().toSet == Set(7L, 8L))
    assert(spark.sql("SELECT k FROM gep.ns.tg.tag_brel")
      .as[Long].collect().toSet == Set(7L, 8L))
    // ... and reports epoch B's CONTRACTS (vB is below the re-stamped
    // epoch, so resolution goes through B's `_props_upto_` archive)
    val tagChecks = tableAt("tg", vB).constraints().map(_.name()).toSet
    assert(tagChecks == Set("b_cap"),
      s"tag above the restore target leaked contracts: $tagChecks")
  }

  test("publishing a branch forked below an epoch refuses after the main REPLACE") {
    // A WAP branch audits data under the fork-time contracts; a
    // REPLACE of main both advances the version AND swaps the contract
    // epoch, so the publish must refuse with the re-create recipe
    // rather than land pre-epoch data onto the replacement.
    spark.sql("""CREATE TABLE gep.ns.bw (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gep.ns.bw VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL gep.system.branch(table => 'ns.bw', name => 'audit')")
    spark.sql("INSERT INTO gep.ns.bw.branch_audit VALUES (3, 'c')")

    spark.sql("""REPLACE TABLE gep.ns.bw TBLPROPERTIES ('keys'='g') AS
                 SELECT CAST(1 AS BIGINT) AS g, 'z' AS w""")
    val e = intercept[Exception] {
      spark.sql("CALL gep.system.publish_branch(table => 'ns.bw', name => 'audit')")
    }
    assert(e.toString.contains("re-create the branch") ||
      (e.getCause != null && e.getCause.toString.contains("re-create the branch")),
      s"publish across a REPLACE must carry the retry recipe: $e")
    // main is untouched by the refused publish
    assert(spark.table("gep.ns.bw").columns.toSeq == Seq("g", "w"))
    // the documented recovery works: re-create under the new contracts
    spark.sql("CALL gep.system.drop_branch(table => 'ns.bw', name => 'audit')")
    spark.sql("CALL gep.system.branch(table => 'ns.bw', name => 'audit')")
    spark.sql("INSERT INTO gep.ns.bw.branch_audit VALUES (9, 'y')")
    spark.sql("CALL gep.system.publish_branch(table => 'ns.bw', name => 'audit')")
    assert(spark.table("gep.ns.bw").as[(Long, String)].collect().toSet ==
      Set((1L, "z"), (9L, "y")))
  }
}
