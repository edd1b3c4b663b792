package graft.connector

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException

import graft.SparkSpec
import graft.store.SnapshotStore

/** Atomic CTAS / RTAS through `StagingTableCatalog`: a failed CREATE
  * TABLE AS SELECT must leave NOTHING behind (no half-created table
  * blocking the retry), and REPLACE TABLE AS SELECT must swap content
  * in one commit — old data readable until the instant the new data
  * is, history preserved for time travel, layout free to change.
  */
class AtomicDdlSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-atomic").toString
  spark.conf.set("spark.sql.catalog.gatm", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gatm.root", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gatm.a")

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def stagingLeftovers: Seq[String] = {
    val p = new Path(s"$warehouse/a/_staging")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  test("CTAS is atomic: a mid-write failure leaves no table and no staging debris") {
    val bad = intercept[Exception] {
      spark.sql("""CREATE TABLE gatm.a.ctas_fail TBLPROPERTIES ('keys'='k') AS
                   SELECT id AS k, assert_true(id < 5, 'boom') AS v FROM range(10)""")
    }
    assert(bad.toString.toLowerCase.contains("boom") ||
      bad.getCause != null, s"unexpected failure shape: $bad")
    assert(!spark.catalog.tableExists("gatm.a.ctas_fail"))
    assert(stagingLeftovers.isEmpty, s"staging debris: $stagingLeftovers")
    // the corrected retry works — nothing is blocking the name
    spark.sql("""CREATE TABLE gatm.a.ctas_fail TBLPROPERTIES ('keys'='k') AS
                 SELECT id AS k, id * 2 AS v FROM range(10)""")
    assert(spark.table("gatm.a.ctas_fail").count() == 10)
    assert(stagingLeftovers.isEmpty)
  }

  test("RTAS swaps content atomically, preserves history, and may change layout") {
    spark.sql("""CREATE TABLE gatm.a.r (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.r SELECT id, CAST(id AS STRING) FROM range(6)")
    val dir = s"$warehouse/a/r"
    val vBefore = SnapshotStore.latestVersion(spark, dir).get

    spark.sql("""REPLACE TABLE gatm.a.r TBLPROPERTIES ('keys'='g', 'numBuckets'='4') AS
                 SELECT k % 2 AS g, COUNT(*) AS n FROM gatm.a.r GROUP BY k % 2""")
    val after = spark.table("gatm.a.r").as[(Long, Long)].collect().toMap
    assert(after == Map(0L -> 3L, 1L -> 3L))
    // ONE new version — history before the replace still reads
    val vAfter = SnapshotStore.latestVersion(spark, dir).get
    assert(vAfter == vBefore + 1)
    val old = spark.sql(s"SELECT * FROM gatm.a.r VERSION AS OF $vBefore")
    assert(old.count() == 6 && old.columns.toSeq == Seq("k", "v"))
    // the new layout took: manifest carries the replacement's keys + buckets
    val m = SnapshotStore.readManifest(spark, dir, vAfter)
    assert(m.keys == Seq("g") && m.numBuckets == 4)
    // zero-copy adoption: the new content lives in rename-adopted dirs
    val adopted = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.contains("-rtas-"))
    assert(adopted.nonEmpty, "expected rename-adopted v=*-rtas-* dirs")
    assert(stagingLeftovers.isEmpty)
  }

  test("RTAS failure leaves the target untouched") {
    spark.sql("""CREATE TABLE gatm.a.rf (k BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k')""")
    spark.sql("INSERT INTO gatm.a.rf VALUES (1, 10), (2, 20)")
    intercept[Exception] {
      spark.sql("""REPLACE TABLE gatm.a.rf TBLPROPERTIES ('keys'='k') AS
                   SELECT id AS k, assert_true(id < 1, 'rtas-boom') AS v FROM range(3)""")
    }
    assert(spark.table("gatm.a.rf").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L)))
    assert(stagingLeftovers.isEmpty)
  }

  test("REPLACE refuses a missing table; CREATE OR REPLACE creates it") {
    val e = intercept[Exception] {
      spark.sql("""REPLACE TABLE gatm.a.nope TBLPROPERTIES ('keys'='k') AS
                   SELECT id AS k FROM range(3)""")
    }
    assert(e.toString.toLowerCase.contains("table") &&
      (e.toString.contains("nope") || e.getMessage.contains("nope")))
    spark.sql("""CREATE OR REPLACE TABLE gatm.a.nope TBLPROPERTIES ('keys'='k') AS
                 SELECT id AS k FROM range(3)""")
    assert(spark.table("gatm.a.nope").count() == 3)
    // and on an EXISTING table it replaces
    spark.sql("""CREATE OR REPLACE TABLE gatm.a.nope TBLPROPERTIES ('keys'='k') AS
                 SELECT id AS k FROM range(5)""")
    assert(spark.table("gatm.a.nope").count() == 5)
  }

  test("REPLACE TABLE without AS SELECT empties atomically; CTAS IF NOT EXISTS is a no-op on existing") {
    spark.sql("""CREATE TABLE gatm.a.re (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.re VALUES (1, 'a'), (2, 'b')")
    val vBefore = SnapshotStore.latestVersion(spark, s"$warehouse/a/re").get
    // bare REPLACE = new empty definition, one commit, history intact
    spark.sql("""REPLACE TABLE gatm.a.re (k BIGINT, n BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k')""")
    assert(spark.table("gatm.a.re").count() == 0)
    assert(spark.table("gatm.a.re").columns.toSeq == Seq("k", "n"))
    assert(spark.sql(s"SELECT * FROM gatm.a.re VERSION AS OF $vBefore")
      .count() == 2)
    // IF NOT EXISTS CTAS on an existing table: no-op, nothing staged
    spark.sql("""CREATE TABLE IF NOT EXISTS gatm.a.re
                 TBLPROPERTIES ('keys'='k') AS SELECT id AS k FROM range(9)""")
    assert(spark.table("gatm.a.re").count() == 0)
    assert(stagingLeftovers.isEmpty)
  }

  test("every REPLACE flavor is the SAME instance (id kept, epoch bumped, held relations refuse; DROP+CREATE severs)") {
    // the r17 fences hinge on this split: REPLACE (bare or AS SELECT)
    // preserves the table's `_table_id` — time travel works across,
    // streams ride replaceBoundary, held relations refuse via the
    // EPOCH fence — while DROP+CREATE severs lineage and mints a new
    // id (held anything refuses via the INSTANCE fence)
    spark.sql("""CREATE TABLE gatm.a.inst (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.inst VALUES (1, 'a')")
    val root = s"$warehouse/a/inst"
    val id0 = SnapshotStore.tableInstanceId(spark, root)
    val held1 = spark.table("gatm.a.inst")
    spark.sql("""REPLACE TABLE gatm.a.inst (k BIGINT, n BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k')""")
    assert(SnapshotStore.tableInstanceId(spark, root) == id0,
      "bare REPLACE must keep the instance id")
    val e1 = intercept[java.util.ConcurrentModificationException](held1.collect())
    assert(e1.getMessage.contains("crossed a contract swap"))
    val held2 = spark.table("gatm.a.inst")
    spark.sql("""REPLACE TABLE gatm.a.inst TBLPROPERTIES ('keys'='g')
                 AS SELECT 7 AS g, CAST(1 AS BIGINT) AS n""")
    assert(SnapshotStore.tableInstanceId(spark, root) == id0,
      "RTAS must keep the instance id")
    val e2 = intercept[java.util.ConcurrentModificationException](held2.collect())
    assert(e2.getMessage.contains("crossed a contract swap"))
    // DROP+CREATE: a NEW instance — the other fence
    val held3 = spark.table("gatm.a.inst")
    spark.sql("DROP TABLE gatm.a.inst")
    spark.sql("""CREATE TABLE gatm.a.inst (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    assert(SnapshotStore.tableInstanceId(spark, root) != id0,
      "DROP+CREATE must mint a new instance id")
    val e3 = intercept[java.util.ConcurrentModificationException](held3.collect())
    assert(e3.getMessage.contains("dropped and re-created"))
  }

  test("REPLACE swaps declared contracts: new props in, old props gone") {
    spark.sql("""CREATE TABLE gatm.a.p (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'team'='old', 'dml.mode'='delta')""")
    spark.sql("INSERT INTO gatm.a.p VALUES (1, 1)")
    spark.sql("""REPLACE TABLE gatm.a.p TBLPROPERTIES ('keys'='k', 'steward'='new') AS
                 SELECT id AS k, id AS v FROM range(4)""")
    val props = SnapshotStore.readProps(spark, s"$warehouse/a/p")
    assert(props.get("steward").contains("new"))
    assert(!props.contains("team") && !props.contains("dml.mode"))
  }

  test("the change feed refuses to diff across a keys-changing REPLACE boundary") {
    spark.sql("""CREATE TABLE gatm.a.cf (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.cf VALUES (1, 'a'), (2, 'b')")
    val dir = s"$warehouse/a/cf"
    val vBefore = SnapshotStore.latestVersion(spark, dir).get
    spark.sql("""REPLACE TABLE gatm.a.cf TBLPROPERTIES ('keys'='g') AS
                 SELECT k % 2 AS g, count(*) AS n FROM gatm.a.cf GROUP BY k % 2""")
    val e = intercept[IllegalStateException] {
      graft.store.ChangeFeed.readChanges(spark, dir, Seq("g"),
        vBefore, vBefore + 1).collect()
    }
    assert(e.getMessage.contains("REPLACE TABLE boundary"))
    // diffs strictly AFTER the boundary work under the new keys
    spark.sql("INSERT INTO gatm.a.cf VALUES (0, 99)")
    val post = graft.store.ChangeFeed.readChanges(spark, dir, Seq("g"),
      vBefore + 1, vBefore + 2)
    assert(post.where("_change_type like 'update%' or _change_type = 'insert'")
      .count() > 0)
  }

  test("REPLACE carries the target's streaming txn marks; history reads under its own epoch schema") {
    spark.sql("""CREATE TABLE gatm.a.tx (k BIGINT, v STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    val dir = s"$warehouse/a/tx"
    // a streaming writer's exactly-once mark on the pre-replace table
    SnapshotStore.commitDelta(spark, dir,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"),
      (cur, delta) => delta.unionByName(cur.join(delta, Seq("k"), "left_anti")),
      txn = Some(("sinkA", 7L)))
    // first-epoch evolution: a declared column history null-fills
    spark.sql("ALTER TABLE gatm.a.tx ADD COLUMN note STRING")
    val vBefore = SnapshotStore.latestVersion(spark, dir).get
    assert(spark.table("gatm.a.tx").columns.contains("note"))

    spark.sql("""REPLACE TABLE gatm.a.tx TBLPROPERTIES ('keys'='k') AS
                 SELECT 9 AS k, 99 AS m""")
    val m = SnapshotStore.readManifest(spark, dir,
      SnapshotStore.latestVersion(spark, dir).get)
    // the redelivery guard survives the replace: batch 7 stays a no-op
    assert(m.txns.get("sinkA").contains(7L), s"txns lost: ${m.txns}")
    // pre-replace versions read under their OWN epoch's declarations —
    // the evolved `note` column still null-fills, and the replacement's
    // `m` column does not leak in
    val old = spark.sql(s"SELECT * FROM gatm.a.tx VERSION AS OF $vBefore")
    assert(old.columns.toSeq == Seq("k", "v", "note"), old.columns.toSeq)
    assert(old.count() == 1)
  }

  test("an in-flight REPLACE's adopted dirs are vacuum-safe while its marker lives") {
    spark.sql("""CREATE TABLE gatm.a.vm (k BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.vm VALUES (1), (2)")
    val dir = s"$warehouse/a/vm"
    // simulate the canonical hard-crash shape: adopted dirs named for
    // latest+1 (adoptAsReplace always targets cur+1), referenced by no
    // manifest — ABOVE the sweep's in-flight-writer guard
    val orphan = new Path(dir, "v=2-rtas-stuck")
    fs.mkdirs(new Path(orphan, "bucket=0"))
    fs.create(new Path(orphan, "bucket=0/part-0.parquet"), true).close()
    val marker = new Path(dir, "_rtas_adopting-test")
    val out = fs.create(marker, true)
    out.write("v=2-rtas-stuck\n".getBytes("UTF-8")); out.close()
    SnapshotStore.vacuum(spark, dir, keepLast = 1)
    assert(fs.exists(orphan), "marker-protected adopted dir was vacuumed")
    // a STALE marker (hard-crashed statement, older than the staging
    // TTL) is resolved by vacuum itself: marker removed, dirs reclaimed
    fs.setTimes(marker, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
    SnapshotStore.vacuum(spark, dir, keepLast = 1)
    assert(!fs.exists(marker), "stale adoption marker should be resolved")
    assert(!fs.exists(orphan), "stale-marked orphan should be reclaimed")
  }

  test("syncDerived recovers from a keys-changing REPLACE with a full refresh, then resumes incrementally") {
    spark.sql("""CREATE TABLE gatm.a.sd (k BIGINT, status STRING) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.sd VALUES (1, 'A'), (2, 'B'), (3, 'A')")
    val src = s"$warehouse/a/sd"
    val tgt = Files.createTempDirectory("graft-sd-tgt").toString + "/t"
    def onlyA(df: org.apache.spark.sql.DataFrame) = df.where("status = 'A'")
    def derived = spark.read.format("graft").load(tgt)
      .as[(Long, String)].collect().toSet
    // bootstrap + one incremental step (keys = the source's, preserved)
    graft.store.ChangeFeed.syncDerived(spark, src, tgt, "sd", Seq("k"),
      numBuckets = 2, transform = onlyA)
    spark.sql("INSERT INTO gatm.a.sd VALUES (4, 'A')")
    graft.store.ChangeFeed.syncDerived(spark, src, tgt, "sd", Seq("k"),
      numBuckets = 2, transform = onlyA)
    assert(derived == Set((1L, "A"), (3L, "A"), (4L, "A")))
    // the source is atomically REPLACEd under NEW keys — the keyed
    // diff is meaningless; the sync must rebuild the target from the
    // full state (re-keying it to the new identity), not throw forever
    spark.sql("""REPLACE TABLE gatm.a.sd TBLPROPERTIES ('keys'='id') AS
                 SELECT k + 100 AS id, status FROM gatm.a.sd""")
    val r = graft.store.ChangeFeed.syncDerived(spark, src, tgt, "sd",
      Seq("id"), numBuckets = 2, transform = onlyA)
    assert(r.isDefined)
    assert(derived == Set((101L, "A"), (103L, "A"), (104L, "A")), derived)
    // and the NEXT change syncs incrementally again under the new keys
    spark.sql("INSERT INTO gatm.a.sd VALUES (999, 'A')")
    graft.store.ChangeFeed.syncDerived(spark, src, tgt, "sd", Seq("id"),
      numBuckets = 2, transform = onlyA)
    assert(derived == Set((101L, "A"), (103L, "A"), (104L, "A"), (999L, "A")),
      derived)
  }

  test("two racing REPLACEs both commit: last writer wins, each is one atomic version") {
    spark.sql("""CREATE TABLE gatm.a.rr (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.rr VALUES (1, 0)")
    val dir = s"$warehouse/a/rr"
    val v0 = SnapshotStore.latestVersion(spark, dir).get
    val cat = spark.sessionState.catalogManager.catalog("gatm")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("a"), "rr")
    def stagedReplace(payload: Long): org.apache.spark.sql.connector.catalog.StagedTable = {
      val cols = Array(
        org.apache.spark.sql.connector.catalog.Column.create("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.connector.catalog.Column.create("v",
          org.apache.spark.sql.types.LongType))
      val info = new org.apache.spark.sql.connector.catalog.TableInfo.Builder()
        .withColumns(cols).withPartitions(Array.empty)
        .withProperties(java.util.Map.of("keys", "k")).build()
      val before = stagingLeftovers.toSet
      val st = cat.stageReplace(ident, info)
      // write the replacement content into the staged table directly
      // (the new _staging child is this call's)
      val stagedName = (stagingLeftovers.toSet -- before).head
      Seq((payload, payload)).toDF("k", "v").write.format("graft")
        .mode("overwrite").save(s"$warehouse/a/_staging/$stagedName")
      st
    }
    // both stage BEFORE either commits — the second commit must lose
    // the race at its first version attempt and retry cleanly
    val first = stagedReplace(100L)
    val second = stagedReplace(200L)
    first.commitStagedChanges()
    second.commitStagedChanges()
    assert(spark.table("gatm.a.rr").as[(Long, Long)].collect().toSet ==
      Set((200L, 200L)))
    val latest = SnapshotStore.latestVersion(spark, dir).get
    assert(latest == v0 + 2, s"expected two REPLACE commits, at v${latest}")
    // every intermediate state is a real version: the loser's content
    // is the middle one
    assert(spark.sql(s"SELECT v FROM gatm.a.rr VERSION AS OF ${v0 + 1}")
      .as[Long].head() == 100L)
    assert(stagingLeftovers.isEmpty)
    // no leaked adoption markers
    assert(!fs.listStatus(new Path(dir)).exists(
      _.getPath.getName.startsWith("_rtas_adopting-")))
  }

  test("racing REPLACE contract swaps SERIALIZE: the later winner archives the " +
      "earlier winner's schema, never a torn mid-swap state") {
    // The manifest commit is atomic; the _schema/_props/ledger swap
    // after it is not. This pins the adversarial interleave the r13
    // scale-10 OCC soak caught live: REPLACE-A commits v+1, is
    // suspended BEFORE its contract swap; REPLACE-B commits v+2, and
    // must WAIT for A's completion stamp instead of (a) archiving the
    // pre-race schema under v+1 and (b) having A, finishing last,
    // clobber B's live _schema/_props with v+1's epoch — the torn end
    // state was a head whose data and declared schema disagreed.
    spark.sql("""CREATE TABLE gatm.a.rsw (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.rsw VALUES (1, 0)")
    val dir = s"$warehouse/a/rsw"
    val v0 = SnapshotStore.latestVersion(spark, dir).get
    val cat = spark.sessionState.catalogManager.catalog("gatm")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("a"), "rsw")
    def stagedReplace(colName: String, payload: String)
        : org.apache.spark.sql.connector.catalog.StagedTable = {
      val cols = Array(
        org.apache.spark.sql.connector.catalog.Column.create(colName,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.connector.catalog.Column.create("n",
          org.apache.spark.sql.types.LongType))
      val info = new org.apache.spark.sql.connector.catalog.TableInfo.Builder()
        .withColumns(cols).withPartitions(Array.empty)
        .withProperties(java.util.Map.of("keys", colName)).build()
      val before = stagingLeftovers.toSet
      val st = cat.stageReplace(ident, info)
      val stagedName = (stagingLeftovers.toSet -- before).head
      Seq((payload, 1L)).toDF(colName, "n").write.format("graft")
        .mode("overwrite").save(s"$warehouse/a/_staging/$stagedName")
      st
    }
    val first = stagedReplace("a", "x")   // epoch v0+1: schema (a, n)
    val second = stagedReplace("b", "y")  // epoch v0+2: schema (b, n)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val firedForA = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.replaceSwapHook = (root, _) =>
      if (root.endsWith("/a/rsw") && firedForA.compareAndSet(false, true)) {
        entered.countDown()
        gate.await(60, java.util.concurrent.TimeUnit.SECONDS): Unit
      }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.DurationInt
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // pin PURE serialization: a long roll-forward grace so B treats
    // latched A as alive and WAITS (the crash spec below pins the
    // heal-after-grace path)
    System.setProperty("graft.snapshot.contractSwapGraceMs", "60000")
    try {
      val fa = Future(first.commitStagedChanges())
      assert(entered.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "REPLACE-A never reached its post-commit window")
      // A has committed v0+1 and is suspended pre-swap
      assert(SnapshotStore.latestVersion(spark, dir).contains(v0 + 1))
      val fb = Future(second.commitStagedChanges())
      // B must BLOCK at contract quiescence BEFORE even committing its
      // own version: the displaced contracts it will archive are not
      // readable until A's swap lands
      Thread.sleep(1500)
      assert(!fb.isCompleted,
        "REPLACE-B ran while A's contract swap was still in flight")
      assert(SnapshotStore.latestVersion(spark, dir).contains(v0 + 1),
        "REPLACE-B committed its version before A's swap completed")
      gate.countDown()
      Await.result(fa, 60.seconds)
      Await.result(fb, 60.seconds)
    } finally {
      System.clearProperty("graft.snapshot.contractSwapGraceMs")
      SnapshotStore.replaceSwapHook = (_, _) => ()
      gate.countDown()
      pool.shutdown()
    }
    // coherent end state: head carries B's schema, data, keys and epoch
    assert(spark.table("gatm.a.rsw").columns.toSeq == Seq("b", "n"))
    assert(spark.table("gatm.a.rsw").as[(String, Long)].collect().toSet ==
      Set(("y", 1L)))
    assert(SnapshotStore.readProps(spark, dir)("graft.schema.epoch").toLong
      == v0 + 2)
    // A's epoch is time-travelable with A's OWN schema — B archived
    // A's contract, not the pre-race table's
    assert(spark.sql(s"SELECT * FROM gatm.a.rsw VERSION AS OF ${v0 + 1}")
      .columns.toSeq == Seq("a", "n"))
    assert(spark.sql(s"SELECT * FROM gatm.a.rsw VERSION AS OF ${v0 + 1}")
      .as[(String, Long)].collect().toSet == Set(("x", 1L)))
    // and the pre-race epoch still resolves below both
    assert(spark.sql(s"SELECT * FROM gatm.a.rsw VERSION AS OF $v0")
      .columns.toSeq == Seq("k", "v"))
  }

  test("a REPLACE crashing between manifest commit and contract swap is " +
      "ROLLED FORWARD by the next contract op from its write-ahead bundle") {
    // The manifest commit is atomic; the contract swap after it is
    // not. A committer dying in between used to leave the table torn
    // until manual repair. Now every contract-swapping commit
    // publishes a write-ahead bundle (_pending_contracts-<v>-<token>,
    // token = the manifest terminator) BEFORE committing, and the next
    // contract op completes the crashed swap from it.
    spark.sql("""CREATE TABLE gatm.a.rcr (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.rcr VALUES (1, 0)")
    val dir = s"$warehouse/a/rcr"
    val v0 = SnapshotStore.latestVersion(spark, dir).get
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.replaceSwapHook = (root, _) =>
      if (root.endsWith("/a/rcr") && crashed.compareAndSet(false, true))
        throw new RuntimeException("simulated crash post-commit pre-swap")
    try {
      val boom = intercept[Exception] {
        spark.sql("""REPLACE TABLE gatm.a.rcr TBLPROPERTIES ('keys'='a') AS
                     SELECT 'x' AS a, 1 AS n""")
      }
      assert(boom.toString.contains("simulated crash") ||
        (boom.getCause != null && boom.getCause.toString.contains("simulated crash")))
    } finally SnapshotStore.replaceSwapHook = (_, _) => ()
    // torn state on disk: the replacement's manifest committed (v0+1),
    // but the epoch stamp never landed and the bundle is still there
    assert(SnapshotStore.latestVersion(spark, dir).contains(v0 + 1))
    assert(!SnapshotStore.readProps(spark, dir).get("graft.schema.epoch")
      .exists(_.toLong >= v0 + 1), "swap should NOT have completed")
    assert(fs.listStatus(new Path(dir)).exists(
      _.getPath.getName.startsWith("_pending_contracts-")))
    // the next REPLACE heals the crashed swap, then does its own
    System.setProperty("graft.snapshot.contractSwapGraceMs", "200")
    try {
      spark.sql("""REPLACE TABLE gatm.a.rcr TBLPROPERTIES ('keys'='b') AS
                   SELECT 'z' AS b, CAST(3 AS BIGINT) AS n""")
    } finally System.clearProperty("graft.snapshot.contractSwapGraceMs")
    // fully coherent: head is the second replacement...
    assert(spark.table("gatm.a.rcr").columns.toSeq == Seq("b", "n"))
    assert(SnapshotStore.readProps(spark, dir)("graft.schema.epoch").toLong
      == v0 + 2)
    // ...the CRASHED epoch was completed exactly as its bundle said:
    // its schema governs v0+1 under time travel (the healer installed
    // it, then archived it under v0+1 when its own swap displaced it)
    assert(spark.sql(s"SELECT * FROM gatm.a.rcr VERSION AS OF ${v0 + 1}")
      .columns.toSeq == Seq("a", "n"))
    assert(spark.sql(s"SELECT * FROM gatm.a.rcr VERSION AS OF ${v0 + 1}")
      .as[(String, Long)].collect().toSet == Set(("x", 1L)))
    // and the pre-crash epoch still resolves below both
    assert(spark.sql(s"SELECT * FROM gatm.a.rcr VERSION AS OF $v0")
      .columns.toSeq == Seq("k", "v"))
    // bundles consumed
    assert(!fs.listStatus(new Path(dir)).exists(
      _.getPath.getName.startsWith("_pending_contracts-")))
  }

  test("a crashed swap BURIED under dozens of plain commits is still found " +
      "and healed (the quiescence scan reaches the stamp floor uncapped)") {
    // plain commits never stamp the epoch, so a crashed REPLACE's
    // flagged-unstamped version can sink arbitrarily deep below the
    // head; the next contract op must still scan down to it — missing
    // it would archive the wrong epoch AND let vacuum reclaim the heal
    // bundle once the wrong stamp passes it
    spark.sql("""CREATE TABLE gatm.a.deep (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.deep VALUES (1, 0)")
    val dir = s"$warehouse/a/deep"
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.replaceSwapHook = (root, _) =>
      if (root.endsWith("/a/deep") && crashed.compareAndSet(false, true))
        throw new RuntimeException("simulated crash post-commit pre-swap")
    try intercept[Exception] {
      spark.sql("""REPLACE TABLE gatm.a.deep TBLPROPERTIES ('keys'='a') AS
                   SELECT 'x' AS a, CAST(1 AS BIGINT) AS n""")
    } finally SnapshotStore.replaceSwapHook = (_, _) => ()
    val vCrashed = SnapshotStore.latestVersion(spark, dir).get
    // bury it: 70 plain keyed commits on the (replaced) table — they
    // read/write under the torn contracts but never touch the stamp
    import spark.implicits._
    (1 to 70).foreach { i =>
      SnapshotStore.commitDelta(spark, dir,
        Seq((s"b$i", i.toLong)).toDF("a", "n"), Seq("a"),
        SnapshotStore.upsertMerge(Seq("a")))
    }
    assert(SnapshotStore.latestVersion(spark, dir).contains(vCrashed + 70))
    System.setProperty("graft.snapshot.contractSwapGraceMs", "200")
    try {
      spark.sql("""REPLACE TABLE gatm.a.deep TBLPROPERTIES ('keys'='b') AS
                   SELECT 'z' AS b, CAST(3 AS BIGINT) AS n""")
    } finally System.clearProperty("graft.snapshot.contractSwapGraceMs")
    // the heal installed the crashed epoch's schema, and THIS replace
    // archived it under its own cur — so the buried epoch (vCrashed
    // through vCrashed+70) time-travels under its own columns
    assert(spark.table("gatm.a.deep").columns.toSeq == Seq("b", "n"))
    assert(SnapshotStore.readProps(spark, dir)("graft.schema.epoch").toLong
      == vCrashed + 71)
    assert(spark.sql(s"SELECT * FROM gatm.a.deep VERSION AS OF $vCrashed")
      .columns.toSeq == Seq("a", "n"))
    assert(spark.sql(
      s"SELECT * FROM gatm.a.deep VERSION AS OF ${vCrashed + 70}")
      .columns.toSeq == Seq("a", "n"))
    assert(!fs.listStatus(new Path(dir)).exists(
      _.getPath.getName.startsWith("_pending_contracts-")))
  }

  test("ALTER TABLE heals a crashed swap before composing its own change") {
    // ALTER is a read-modify-write of _schema/_props with no manifest
    // commit of its own — composed against a torn mid-crash state it
    // would persist the WRONG epoch's contracts with its change glued
    // on. It must serialize behind (and, for a crashed committer,
    // roll forward) the pending swap first.
    spark.sql("""CREATE TABLE gatm.a.alt (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.alt VALUES (1, 0)")
    val dir = s"$warehouse/a/alt"
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.replaceSwapHook = (root, _) =>
      if (root.endsWith("/a/alt") && crashed.compareAndSet(false, true))
        throw new RuntimeException("simulated crash post-commit pre-swap")
    try intercept[Exception] {
      spark.sql("""REPLACE TABLE gatm.a.alt TBLPROPERTIES ('keys'='a') AS
                   SELECT 'x' AS a, CAST(1 AS BIGINT) AS n""")
    } finally SnapshotStore.replaceSwapHook = (_, _) => ()
    val vCrashed = SnapshotStore.latestVersion(spark, dir).get
    // still torn: live props lack the replacement's keys + stamp
    assert(!SnapshotStore.readProps(spark, dir).get("graft.schema.epoch")
      .exists(_.toLong >= vCrashed))
    System.setProperty("graft.snapshot.contractSwapGraceMs", "200")
    try {
      spark.sql("ALTER TABLE gatm.a.alt SET TBLPROPERTIES ('team'='ops')")
    } finally System.clearProperty("graft.snapshot.contractSwapGraceMs")
    // the ALTER healed the swap first, THEN composed on the healed
    // epoch: replacement schema + stamp present, new prop glued on
    val props = SnapshotStore.readProps(spark, dir)
    assert(props("graft.schema.epoch").toLong == vCrashed)
    assert(props.get("team").contains("ops"))
    assert(spark.table("gatm.a.alt").columns.toSeq == Seq("a", "n"))
    assert(!fs.listStatus(new Path(dir)).exists(
      _.getPath.getName.startsWith("_pending_contracts-")))
  }

  test("a create race is detected and withdrawn: the winner's table survives intact") {
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("a"), "raced")
    val cat = spark.sessionState.catalogManager.catalog("gatm")
      .asInstanceOf[GraftCatalog]
    val cols = Array(
      org.apache.spark.sql.connector.catalog.Column.create("k",
        org.apache.spark.sql.types.LongType))
    val info = new org.apache.spark.sql.connector.catalog.TableInfo.Builder()
      .withColumns(cols)
      .withPartitions(Array.empty)
      .withProperties(java.util.Map.of("keys", "k"))
      .build()
    val staged = cat.stageCreate(ident, info)
    // a competitor lands the table between stage and commit
    spark.sql("""CREATE TABLE gatm.a.raced (k BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k')""")
    spark.sql("INSERT INTO gatm.a.raced VALUES (42)")
    intercept[TableAlreadyExistsException] { staged.commitStagedChanges() }
    // winner intact, loser fully withdrawn (no nested staged dir)
    assert(spark.table("gatm.a.raced").as[Long].collect().toSeq == Seq(42L))
    val nested = fs.listStatus(new Path(s"$warehouse/a/raced"))
      .map(_.getPath.getName).filter(_.startsWith("raced-"))
    assert(nested.isEmpty, s"staged dir nested inside winner: ${nested.toSeq}")
    assert(stagingLeftovers.isEmpty)
  }

  test("a write planned before a REPLACE refuses the new epoch (lost generation)") {
    // the contract-op chaos soak caught a SQL INSERT planned against
    // the pre-REPLACE table landing (k, v)-shaped rows INSIDE the
    // replacement epoch — VERSION AS OF then presented a four-column
    // cross-epoch union. Both detectors must fire as documented
    // concurrent-modification conflicts, and the polluted commit must
    // never land.
    spark.sql("""CREATE TABLE gatm.a.lostgen (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gatm.a.lostgen VALUES (1, 10)")
    val root = s"$warehouse/a/lostgen"
    val planned = SnapshotStore.latestVersion(spark, root)

    // (a) keys-changing REPLACE → the manifest-keys detector
    spark.sql("""REPLACE TABLE gatm.a.lostgen TBLPROPERTIES ('keys'='c') AS
                 SELECT 'x' AS c, CAST(1 AS BIGINT) AS n""")
    val eA = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commitDelta(spark, root, Seq((2L, 20L)).toDF("k", "v"),
        Seq("k"), SnapshotStore.upsertMerge(Seq("k")),
        plannedVersion = planned)
    }
    assert(eA.getMessage.contains("REPLACED"))

    // (b) SAME-keys REPLACE (schema changed, key name kept) → the
    // epoch-flag detector; the keys comparison alone cannot see it
    spark.sql("""REPLACE TABLE gatm.a.lostgen TBLPROPERTIES ('keys'='k') AS
                 SELECT CAST(7 AS BIGINT) AS k, CAST(1 AS BIGINT) AS n""")
    val planned2 = planned // still the pre-REPLACE snapshot
    val eB = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commitDelta(spark, root, Seq((2L, 20L)).toDF("k", "v"),
        Seq("k"), SnapshotStore.upsertMerge(Seq("k")),
        plannedVersion = planned2)
    }
    assert(eB.getMessage.contains("epoch boundary"))

    // (c) restore RE-INSTATES the first epoch: version- and key-based
    // detectors see a current-looking table again, so the execution-
    // time SHAPE guard is the one that must catch a plan analyzed
    // against the replacement epoch (stray column = displaced shape)
    SnapshotStore.restore(spark, root, planned.get)
    val eC = intercept[java.util.ConcurrentModificationException] {
      GraftWrite.staleShapeGuard(spark, root,
        Seq(("x", 1L)).toDF("c", "n")) // the REPLACED epoch's shape
    }
    assert(eC.getMessage.contains("no longer declares"))
    // a SUBSET frame stays legal (partial INSERT column lists)
    GraftWrite.staleShapeGuard(spark, root, Seq(Tuple1(5L)).toDF("k"))

    // nothing polluted: the head reads under the restored epoch, and a
    // FRESH write (planned at the current version) lands normally
    assert(spark.table("gatm.a.lostgen").columns.toSeq == Seq("k", "v"))
    spark.sql("INSERT INTO gatm.a.lostgen VALUES (8, 2)")
    assert(spark.table("gatm.a.lostgen").count() == 2)
    // every retained version still presents exactly two columns
    SnapshotStore.versions(spark, root).foreach { v =>
      assert(spark.sql(s"SELECT * FROM gatm.a.lostgen VERSION AS OF $v")
        .columns.length == 2, s"version $v leaked a cross-epoch union")
    }
  }
}
