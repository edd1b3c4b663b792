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
}
