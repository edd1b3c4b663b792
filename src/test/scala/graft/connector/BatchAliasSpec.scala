package graft.connector

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.store.{ChangeFeed, SnapshotStore}

/** The BATCH instance-aliasing audit (r16 verdict item 1): bug #4
  * proved a resume-at-one-path surface silently aliases a DROPPED and
  * RE-CREATED table's restarted version numbering — the r16 fix fenced
  * only the streaming change feed. This spec enumerates every BATCH
  * read/write resume surface and proves each is loud-or-correct, never
  * silent stale/skip:
  *
  *  1. a HELD DSv2 relation (stale DataFrame / cached plan) re-executed
  *     after drop+recreate — pre-fence, the scan re-read the successor's
  *     manifest under the predecessor's schema: a same-arity change
  *     null-fills/mis-binds SILENTLY (mergeSchema by-name). Now refused
  *     by the relation-level `_table_id` fence.
  *  2. a held TIME-TRAVEL relation — `versionAsOf` aliases the
  *     successor's restarted numbering to a DIFFERENT snapshot. Fenced.
  *  3. a stale LIBRARY DataFrame (SnapshotStore.read) — its plan bakes
  *     the predecessor's attempt-token dirs, which a recreate can never
  *     reuse (tokens are unique), so execution fails loudly. Spec'd.
  *  4. foreachBatch txn dedup — txn marks live IN the manifest and die
  *     with the instance, so a redelivered batch APPLIES to the
  *     successor (exactly-once per instance, no phantom skip). Spec'd.
  *  5. syncDerived across a source recreate — consumer rows die with
  *     the instance (loud "unregistered"), and txn marks are keyed by
  *     the SOURCE INSTANCE so an operator's re-seed rebuild is never a
  *     silent txn no-op (the write-side alias this audit found).
  *  6. consumeChanges across a recreate — the consumer row dies with
  *     the instance; the next call re-seeds at the successor's latest
  *     (the documented new-consumer contract) and subsequent changes
  *     flow. Reference shape for all of these: CREATE-OR-REPLACE
  *     rebuilds (`02 Location Entity.sql:282-343`).
  */
class BatchAliasSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-balias").toString
  locally {
    spark.conf.set("spark.sql.catalog.bat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bat.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bat.ns")
  }

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val merge = SnapshotStore.upsertMerge(Seq("k"))

  test("1. a held catalog relation refuses execution after DROP+CREATE (never a silent mis-bind)") {
    spark.sql("""CREATE TABLE bat.ns.t1 (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO bat.ns.t1 VALUES (1, 10)")
    val held = spark.table("bat.ns.t1") // resolves instance 1
    assert(held.count() == 1)
    spark.sql("DROP TABLE bat.ns.t1")
    // the CREATE-OR-REPLACE rebuild shape: same name, same ARITY,
    // different meaning — pre-fence the held plan read the successor's
    // files by name under the old schema (null-filled k/v = garbage
    // rows, no exception)
    spark.sql("""CREATE TABLE bat.ns.t1 (a STRING, b BIGINT) USING graft
                 TBLPROPERTIES ('keys'='a', 'numBuckets'='2')""")
    spark.sql("INSERT INTO bat.ns.t1 VALUES ('x', 20)")
    val e = intercept[java.util.ConcurrentModificationException] {
      held.collect()
    }
    assert(e.getMessage.contains("dropped and re-created"),
      s"wrong refusal: ${e.getMessage}")
    // a FRESH resolution of the identifier reads the successor — the
    // correct recovery
    assert(spark.table("bat.ns.t1").count() == 1)
  }

  test("2. a held time-travel relation refuses after recreate (versionAsOf would alias the new numbering)") {
    val root = Files.createTempDirectory("graft-balias-tt").toString + "/t"
    SnapshotStore.init(spark, root,
      Seq((1L, "one")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root,
      Seq((2L, "two")).toDF("k", "v"), Seq("k"), merge)
    val v0 = spark.read.format("graft").option("versionAsOf", "0").load(root)
    assert(v0.count() == 1)
    // drop + recreate at the same path: the successor has its OWN v0
    // with different content — the held pin must not silently read it
    fsOf(root).delete(new Path(root), true)
    SnapshotStore.init(spark, root,
      Seq((7L, "seven"), (8L, "eight")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    val e = intercept[java.util.ConcurrentModificationException] {
      v0.collect()
    }
    assert(e.getMessage.contains("dropped and re-created"),
      s"wrong refusal: ${e.getMessage}")
  }

  test("3. a stale library DataFrame fails loudly after recreate (baked dirs can never alias)") {
    val root = Files.createTempDirectory("graft-balias-lib").toString + "/t"
    SnapshotStore.init(spark, root,
      Seq((1L, "one")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    val held = SnapshotStore.read(spark, root)
    assert(held.count() == 1)
    fsOf(root).delete(new Path(root), true)
    SnapshotStore.init(spark, root,
      Seq((9L, "nine")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    // the held plan references v=0-<oldToken>/ dirs; tokens are unique
    // per attempt, so the successor cannot recreate them — execution
    // must throw (FileNotFound class), never return successor rows
    val r = try Left(held.collect().toSeq) catch { case e: Throwable => Right(e) }
    r match {
      case Left(rows) => fail(
        s"stale library DataFrame silently returned rows after the " +
          s"recreate: $rows")
      case Right(_) => () // loud, as designed
    }
  }

  test("4. txn marks die with the instance: a redelivered batch APPLIES to the successor") {
    val root = Files.createTempDirectory("graft-balias-txn").toString + "/t"
    SnapshotStore.init(spark, root,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "b7")).toDF("k", "v"), Seq("k"), merge, txn = Some("w" -> 7L))
    // redelivery on the SAME instance: a no-op (the txn contract)
    val before = SnapshotStore.latestVersion(spark, root)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "b7-again")).toDF("k", "v"), Seq("k"), merge, txn = Some("w" -> 7L))
    assert(SnapshotStore.latestVersion(spark, root) == before)
    // drop + recreate: the successor never saw batch 7 — the mark died
    // with the predecessor's manifest, so the redelivery must APPLY
    // (a phantom skip here would silently lose the batch)
    fsOf(root).delete(new Path(root), true)
    SnapshotStore.init(spark, root,
      Seq((1L, "fresh")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, "b7")).toDF("k", "v"), Seq("k"), merge, txn = Some("w" -> 7L))
    val vs = SnapshotStore.read(spark, root).select("v").as[String]
      .collect().toSet
    assert(vs == Set("b7"),
      s"batch 7 did not apply to the successor instance: $vs")
  }

  test("5. syncDerived: a re-created source is LOUD unregistered; a re-seeded rebuild is never a silent txn no-op") {
    val src = Files.createTempDirectory("graft-balias-sd").toString + "/src"
    val tgt = Files.createTempDirectory("graft-balias-sd").toString + "/tgt"
    SnapshotStore.init(spark, src,
      (1L to 5L).map(k => (k, "old")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    // bootstrap + one incremental sync: the target's txn mark now sits
    // at the PREDECESSOR's version numbering
    assert(ChangeFeed.syncDerived(spark, src, tgt, "d", Seq("k")).nonEmpty)
    SnapshotStore.commitDelta(spark, src,
      Seq((1L, "old2")).toDF("k", "v"), Seq("k"), merge)
    SnapshotStore.commitDelta(spark, src,
      Seq((2L, "old3")).toDF("k", "v"), Seq("k"), merge)
    assert(ChangeFeed.syncDerived(spark, src, tgt, "d", Seq("k")).contains((0L, 2L)))
    // source dropped and re-created (the CREATE-OR-REPLACE rebuild):
    // consumer rows died with the instance — the next sync is LOUD
    fsOf(src).delete(new Path(src), true)
    SnapshotStore.init(spark, src,
      (1L to 5L).map(k => (k, "new")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    val e = intercept[IllegalStateException] {
      ChangeFeed.syncDerived(spark, src, tgt, "d", Seq("k"))
    }
    assert(e.getMessage.contains("unregistered"),
      s"wrong failure: ${e.getMessage}")
    // the operator's recovery: re-seed at -1 and rebuild. The
    // successor's versions (0) alias BELOW the target's old txn mark
    // (2) — with instance-less txn keys this rebuild was a SILENT
    // no-op (commit skipped as already-applied) and the offset still
    // advanced: permanent data loss. Instance-keyed txns apply it.
    ChangeFeed.seedConsumer(spark, src, "d", -1L)
    assert(ChangeFeed.syncDerived(spark, src, tgt, "d", Seq("k")).nonEmpty)
    val got = SnapshotStore.read(spark, tgt).select("k", "v")
      .as[(Long, String)].collect().toMap
    assert((1L to 5L).forall(k => got.get(k).contains("new")),
      s"the rebuild was silently skipped (stale target state): $got")
  }

  test("7. a held relation refuses after a SAME-instance REPLACE (epoch fence — never a silent null-filled mis-bind)") {
    // found by the r17 branch hunt's held-relation op on its FIRST
    // run: a REPLACE keeps the table's `_table_id` (same instance, the
    // instance fence correctly passes), but a held relation's scan
    // then read the NEW epoch's manifest under the OLD schema and the
    // by-name parquet read null-filled the vanished key column — 20
    // rows of silent garbage, no exception. The epoch stamp changes
    // exactly at swaps; the relation now captures it at resolution and
    // refuses the scan after any swap.
    spark.sql("""CREATE TABLE bat.ns.e1 (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO bat.ns.e1 VALUES (1, 10)")
    val held = spark.table("bat.ns.e1")
    assert(held.count() == 1)
    // same-arity, different meaning — the hazard shape
    spark.sql("""REPLACE TABLE bat.ns.e1 TBLPROPERTIES ('keys'='c')
                 AS SELECT 'r' AS c, CAST(1 AS BIGINT) AS n""")
    val e = intercept[java.util.ConcurrentModificationException] {
      held.collect()
    }
    assert(e.getMessage.contains("crossed a contract swap"),
      s"wrong refusal: ${e.getMessage}")
    // a fresh resolution reads the new epoch — the correct recovery
    assert(spark.table("bat.ns.e1").columns.toSeq == Seq("c", "n"))
    // and a held TIME-TRAVEL relation stays exempt: its pinned version's
    // files belong to the archived epoch and are never rewritten
    val tt = spark.read.format("graft").option("versionAsOf", "0")
      .load(s"$warehouse/ns/e1")
    assert(tt.columns.toSeq == Seq("k", "v") && tt.count() == 0)
  }

  test("8. a held batch-CDF relation refuses across recreate AND across REPLACE (offset/schema aliasing)") {
    // the V1 readChangeFeed relation re-resolves `latest` per scan, so
    // a held relation across drop+recreate silently replayed the
    // caller's offsets against the successor's restarted numbering,
    // and across a REPLACE its creation-time schema silently
    // null-filled the new epoch's change rows. Both now refuse.
    val root = Files.createTempDirectory("graft-balias-cdf").toString + "/t"
    SnapshotStore.init(spark, root,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    def cdf() = spark.read.format("graft")
      .option("readChangeFeed", "true").option("keys", "k")
      .option("startingVersion", "-1").load(root)
    val held = cdf()
    assert(held.count() > 0)
    // same-instance REPLACE (library door: replaceAll with new keys is
    // a REPLACE-shaped swap only via SQL; use the catalog)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bat.ns")
    spark.sql("""CREATE TABLE bat.ns.cdf (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO bat.ns.cdf VALUES (1, 'a')")
    val catRoot = s"$warehouse/ns/cdf"
    def catCdf() = spark.read.format("graft")
      .option("readChangeFeed", "true").option("keys", "k")
      .option("startingVersion", "-1")
      .option("replaceBoundary", "refresh").load(catRoot)
    val heldCat = catCdf()
    assert(heldCat.count() > 0)
    spark.sql("""REPLACE TABLE bat.ns.cdf TBLPROPERTIES ('keys'='g')
                 AS SELECT 7 AS g, CAST(1 AS BIGINT) AS n""")
    val e1 = intercept[java.util.ConcurrentModificationException] {
      heldCat.collect()
    }
    assert(e1.getMessage.contains("crossed a contract swap"),
      s"wrong refusal: ${e1.getMessage}")
    // a FRESH relation still reads the refresh across the boundary —
    // the long-lived-view contract is bound at creation, not forever
    assert(catCdf().count() > 0)
    // drop + recreate under the held library-door relation
    fsOf(root).delete(new Path(root), true)
    SnapshotStore.init(spark, root,
      Seq((9L, "z")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    val e2 = intercept[java.util.ConcurrentModificationException] {
      held.collect()
    }
    assert(e2.getMessage.contains("dropped and re-created"),
      s"wrong refusal: ${e2.getMessage}")
  }

  test("9. path read door: a REPLACE in Spark's inferSchema->getTable gap refuses at scan (the handoff pairs stamp and schema)") {
    // r17 advice #1: supportsExternalMetadata is false, so Spark hands
    // getTable the schema inferSchema resolved — in a SEPARATE call.
    // Pre-fix, getTable's GraftTable read its epoch stamp fresh at
    // construction, so a REPLACE completing in the gap paired the NEW
    // stamp with the OLD resolution's schema: the fence then passed at
    // every scan and the by-name read silently null-filled the vanished
    // columns (the seed-1001 class, re-opened on the path door). The
    // resolution pin hands inferSchema's validated (schema, stamp,
    // instance) triple to getTable, so the held table refuses loudly.
    spark.sql("""CREATE TABLE bat.ns.p1 (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO bat.ns.p1 VALUES (1, 10)")
    val root = s"$warehouse/ns/p1"
    val provider = new GraftDataSource
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("path", root))
    val schema = provider.inferSchema(opts) // Spark's step 1
    // the swap lands exactly in the protocol gap
    spark.sql("""REPLACE TABLE bat.ns.p1 TBLPROPERTIES ('keys'='c')
                 AS SELECT 'r' AS c, CAST(1 AS BIGINT) AS n""")
    val t = provider.getTable(schema, Array.empty, opts.asCaseSensitiveMap())
    val e = intercept[java.util.ConcurrentModificationException] {
      t.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(opts)
    }
    assert(e.getMessage.contains("crossed a contract swap"),
      s"wrong refusal: ${e.getMessage}")
  }

  test("10. path read door: a DROP+CREATE in the inferSchema->getTable gap refuses at scan (instance from the same resolution)") {
    // r17 advice #2, the instance twin of test 9: pre-fix the
    // `_table_id` was read at CONSTRUCTION, so a recreate completing in
    // the gap bound the SUCCESSOR's id to the PREDECESSOR's schema pin
    // and the instance fence passed at every scan — and the epoch fence
    // cannot catch it (a fresh table has no stamp: -1 on both sides).
    spark.sql("""CREATE TABLE bat.ns.p2 (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO bat.ns.p2 VALUES (1, 10)")
    val root = s"$warehouse/ns/p2"
    val provider = new GraftDataSource
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("path", root))
    val schema = provider.inferSchema(opts)
    spark.sql("DROP TABLE bat.ns.p2")
    // SAME shape — nothing but the instance id distinguishes the
    // successor, which is exactly why the silent alias was silent
    spark.sql("""CREATE TABLE bat.ns.p2 (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO bat.ns.p2 VALUES (99, 990)")
    val t = provider.getTable(schema, Array.empty, opts.asCaseSensitiveMap())
    val e = intercept[java.util.ConcurrentModificationException] {
      t.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(opts)
    }
    assert(e.getMessage.contains("dropped and re-created"),
      s"wrong refusal: ${e.getMessage}")
  }

  test("11. a recreate landing INSIDE one resolution attempt never pairs the successor's id with the predecessor's schema") {
    // the bracket itself (r17 advice #2): the instance id is read
    // before and after each attempt's schema reads; movement = retry.
    // Pre-fix the id was read once, AFTER resolution — the hook below
    // lands a recreate in that exact window, and the unbracketted read
    // returned (predecessor schema, successor id): a pairing the
    // instance fence then waves through forever.
    val root = Files.createTempDirectory("graft-balias-br").toString + "/t"
    SnapshotStore.init(spark, root,
      Seq((1L, 10L)).toDF("k", "v"), Seq("k"), numBuckets = 2)
    val pred = SnapshotStore.tableInstanceIdIfAny(spark, root)
    assert(pred.nonEmpty)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    GraftTable.resolutionRaceHook = { r =>
      if (r == root && fired.compareAndSet(false, true)) {
        fsOf(root).delete(new Path(root), true)
        SnapshotStore.init(spark, root,
          Seq(("x", 1L)).toDF("a", "b"), Seq("a"), numBuckets = 2)
      }
    }
    try {
      val b = GraftTable.resolveSchemaBound(spark, root, None)
      val succ = SnapshotStore.tableInstanceIdIfAny(spark, root)
      assert(succ.nonEmpty && succ != pred, "the hook must have recreated")
      assert(b.instance == succ,
        s"bound instance ${b.instance} is not the successor's $succ — " +
          "the resolution paired reads from two instances")
      assert(b.schema.fieldNames.toSeq == Seq("a", "b"),
        s"bound schema ${b.schema.fieldNames.toSeq} is not the successor's" +
          " — the resolution paired reads from two instances")
    } finally GraftTable.resolutionRaceHook = _ => ()
  }

  test("12. a fence that cannot re-read the stamp REFUSES the scan (a store error is never 'unchanged')") {
    // r17 advice #4: pre-fix, verifyEpoch's catch fell back to the
    // BOUND stamp — a transient GET failure landing exactly when a
    // REPLACE completed let the fence pass and the scan null-fill the
    // new epoch under the old schema, the silent mis-bind the fence
    // exists to refuse. Now any fence that cannot re-read its stamp
    // throws the retry-able CME.
    spark.sparkContext.hadoopConfiguration.set(
      "fs.osim.impl", classOf[graft.store.ObjectStoreSim].getName)
    graft.store.ObjectStoreSim.reset()
    val root = "osim://" +
      Files.createTempDirectory("graft-balias-loud").toString + "/t"
    try {
      SnapshotStore.init(spark, root,
        Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 2)
      // materialize `_props` so the fence's re-read is a real GET
      SnapshotStore.writeProps(spark, root, Map("note" -> "x"))
      val held = spark.read.format("graft").load(root)
      assert(held.count() == 1) // fences pass while the store is healthy
      graft.store.ObjectStoreSim.failOpenPathFilter = _.endsWith("/_props")
      val e = intercept[java.util.ConcurrentModificationException] {
        held.collect()
      }
      assert(e.getMessage.contains("refusing the scan"),
        s"wrong refusal: ${e.getMessage}")
      // transient means transient: the same relation runs once the
      // store recovers
      graft.store.ObjectStoreSim.failOpenPathFilter = _ => false
      assert(held.count() == 1)
    } finally graft.store.ObjectStoreSim.reset()
  }

  test("6. consumeChanges: recreate resets the consumer (documented), and subsequent changes flow") {
    val root = Files.createTempDirectory("graft-balias-cc").toString + "/t"
    SnapshotStore.init(spark, root,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    assert(ChangeFeed.consumeChanges(spark, root, "c", Seq("k"))((_, _, _) => ()).isEmpty)
    SnapshotStore.commitDelta(spark, root,
      Seq((2L, "b")).toDF("k", "v"), Seq("k"), merge)
    assert(ChangeFeed.consumeChanges(spark, root, "c", Seq("k"))((_, _, _) => ())
      .contains((0L, 1L)))
    // drop + recreate: the offset row died with the instance; the next
    // call is indistinguishable from a NEW consumer and re-seeds at the
    // successor's latest — inherent (nothing can deliver a dead
    // instance's changes), documented on consumeChanges; callers with
    // durable downstream state get the LOUD path via syncDerived
    fsOf(root).delete(new Path(root), true)
    SnapshotStore.init(spark, root,
      Seq((1L, "fresh")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    assert(ChangeFeed.consumeChanges(spark, root, "c", Seq("k"))((_, _, _) => ()).isEmpty)
    // ...and the successor's NEXT commit reaches the consumer
    SnapshotStore.commitDelta(spark, root,
      Seq((3L, "c")).toDF("k", "v"), Seq("k"), merge)
    var rows = 0L
    assert(ChangeFeed.consumeChanges(spark, root, "c", Seq("k"))(
      (df, _, _) => rows = df.count()).contains((0L, 1L)))
    assert(rows > 0, "the successor's commit must flow to the reset consumer")
  }
}
