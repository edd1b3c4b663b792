package graft.connector

import java.util.concurrent.CountDownLatch

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.store.SnapshotStore

/** BRANCH-INTERIOR chaos (r15 verdict item #1 — the largest unhunted
  * op space): a LONG-LIVED write-audit-publish branch is itself a full
  * graft table, so the entire contract-op vocabulary must hold INSIDE
  * it — branch-side DML (SQL INSERT/DELETE/UPDATE/MERGE through a
  * catalog rooted at the parent table, addressing `_branch`.`<name>`),
  * branch-side REPLACE/restore/compact/checkpoint/vacuum/rebucket/tags
  * — while main mutates underneath (inserts, deletes, vacuum of the
  * shared base directories the branch's clone-consumer must protect,
  * compact, restore) and rival threads attempt PUBLISH mid-chaos.
  *
  * On its first high-intensity sweep this hunt found a REAL bug pair
  * (fixed + spec-pinned in BranchLifecycleSpec): publishBranch's
  * post-commit cleanup was instance-blind — it deleted a SUCCESSOR
  * branch re-created under the same name and released the retention
  * consumer the two instances share by path, letting main's vacuum
  * reclaim directories the live successor still referenced; and
  * recoverPublish would roll back a LIVE rival publisher's adoption
  * renames (no marker age gate, no publish mutex).
  *
  * Publish CONSUMES the branch (fast-forward + dropBranch), so ops
  * racing a successful publish legally find the branch gone — the
  * DROP-TABLE-like semantics documented on
  * [[SnapshotStore.publishBranch]]. The classifier adds the
  * branch-specific documented classes on top of
  * [[ChaosOps.documented]]: branch-consumed, FNF/rename-class failures
  * while a publish is in flight or after the op's branch generation
  * was consumed under it, and FNF whose version dir a main-retained
  * manifest references under its adopted `-pub-` name.
  *
  * `uniqueNames` (the plain-PUT+arbiter personality): the arbiter's
  * PERMANENT commit rows fence a dropped table's path for the
  * staleness grace — same-name re-forks there refuse with the
  * documented fence conflict, so the lifecycle forks each generation
  * under a fresh name, the realistic pattern on such stores.
  *
  * Quiescence: the final fork→write→publish cycle must land exactly
  * (main's head state equals the branch state captured before the
  * publish), main passes the shared [[ChaosOps.assertQuiescence]]
  * sweep, and no live branch is left mid-publish.
  */
object BranchChaosOps {

  /** Runs one branch hunt; returns (landed, documented conflicts).
    *
    * `dmlMode = "delta"` composes the two r16 personalities for the
    * first time (r16 verdict item 2): the table — and therefore the
    * BRANCH fork, whose clone carries `_props` — declares
    * `dml.mode=delta`, so every branch-interior UPDATE/DELETE/MERGE
    * takes the WriteDelta staging + DeltaDmlRuntimeFiltering path
    * while publish / re-fork / branch-REPLACE / vacuum race it.
    */
  def hunt(spark: SparkSession, catalog: String, warehouse: String,
           tbl: String, seed: Int, nThreads: Int, opsPer: Int,
           info: String => Unit, uniqueNames: Boolean = false,
           dmlMode: String = "cow"): (Int, Int) = {
    val root = s"$warehouse/ns/$tbl"
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val modeProps = if (dmlMode == "delta") ", 'dml.mode'='delta'" else ""
    spark.sql(s"""CREATE TABLE $catalog.ns.$tbl (k BIGINT, v BIGINT) USING graft
                  TBLPROPERTIES ('keys'='k', 'numBuckets'='2'$modeProps)""")
    spark.sql(s"INSERT INTO $catalog.ns.$tbl SELECT id, id FROM range(0, 20)")
    // a second catalog rooted at the TABLE makes the branch SQL-able:
    // <tableRoot>/_branch/<name> is a full graft table root. The name
    // must embed the MAIN catalog too: CatalogManager caches catalog
    // INSTANCES by name, so a same-named catalog from an earlier hunt
    // (same tbl, different warehouse) would keep serving the old root
    // no matter what the conf now says.
    val bcat = s"${catalog}br${tbl.filter(_.isLetterOrDigit)}"
    spark.conf.set(s"spark.sql.catalog.$bcat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$bcat.root", root)

    // bumped on every lifecycle re-fork: an op that STARTED on an older
    // generation and then failed FNF-class lost its branch to a
    // publish+drop mid-statement — documented consumption semantics
    val generation = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var curBn: String = if (uniqueNames) "hb0" else "hb"
    def curBr: String = SnapshotStore.branchRoot(root, curBn)
    def curTable: String = s"$bcat.`_branch`.$curBn"
    SnapshotStore.createBranch(spark, root, curBn): Unit

    val epochN = new java.util.concurrent.atomic.AtomicInteger(0)
    val publishing = new java.util.concurrent.atomic.AtomicInteger(0)
    val recreateLock = new java.util.concurrent.locks.ReentrantLock()
    val gate = new CountDownLatch(1)
    val opsLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def dump(reason: String, extra: Seq[String]): String =
      ChaosOps.dumpDiagnostics(s"branchhunt-$tbl",
        s"reason: $reason" +: s"seed: $seed" +:
          s"main versions: ${scala.util.Try(SnapshotStore.versions(spark, root)).toOption}" +:
          s"branch ($curBn) versions: ${scala.util.Try(SnapshotStore.versions(spark, curBr)).toOption}" +:
          (opsLog.toArray(Array.empty[String]).toSeq.map("op: " + _) ++ extra))

    def chainText(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => s"${x.getClass.getName}: ${x.getMessage}").mkString("\n")

    /** A main-retained manifest referencing the missing branch dir's
      * adopted `-pub-` twin = a committed publish whose dropBranch has
      * not finished — the dir legally moved to main.
      */
    def adoptedTwin(e: Throwable): Boolean = {
      val rx = """(v=[^/\s]+)/""".r
      val dirs = rx.findAllMatchIn(chainText(e)).map(_.group(1)).toSet
      dirs.nonEmpty && {
        val mainRefs =
          try SnapshotStore.versions(spark, root).flatMap { v =>
            SnapshotStore.readManifest(spark, root, v).buckets.values
              .flatMap(en => en.dir +: en.tombstones)
          }.toSet
          catch { case _: Throwable => Set.empty[String] }
        dirs.exists(d => mainRefs.exists(r =>
          r.contains("-pub-") && r.contains(d.stripPrefix("v="))))
      }
    }

    def branchGone(): Boolean =
      scala.util.Try(SnapshotStore.versions(spark, curBr)).toOption
        .forall(_.isEmpty)

    def documented(e: Throwable, genAtStart: Int): Boolean = {
      val text = chainText(e)
      ChaosOps.documented(e) ||
        ChaosOps.vacuumRace(spark, root, e) ||
        ChaosOps.vacuumRace(spark, curBr, e) ||
        text.contains("no committed graft table") ||
        text.contains("no table at") || // checkpoint/compact on a consumed branch
        text.contains("nothing to clone") ||
        text.contains("no branch '") ||
        text.contains("NoSuchTableException") ||
        text.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        text.contains("being re-created") ||
        // the batch change-feed op's documented refusals: a base
        // manifest vacuumed out from under a consumer-less feed read,
        // and a REPLACE landing between the relation's boundary check
        // and its diff (the refresh recovery re-checks per scan)
        text.contains("was vacuumed — register a consumer") ||
        text.contains("crosses a REPLACE TABLE boundary") ||
        // FNF/rename-class failures while a publish is in flight
        // (adoption renames own that window) or after the branch this
        // op started on was consumed/re-forked under it (publish+drop
        // = DROP-TABLE-like consumption — loud at the statement)
        ((text.contains("does not exist") || text.contains("FileNotFound") ||
          text.contains("No such file") || text.contains("NoSuchFile") ||
          // object-store rename is copy+delete: a dir consumed mid-op
          // surfaces as a failed task/job-commit rename, not an FNF
          text.contains("Failed to rename") ||
          text.contains("TASK_WRITE_FAILED") ||
          // a write planning against a HALF-DELETED branch (publish's
          // dropBranch is file-by-file on object stores) can catch a
          // state whose readable manifest lacks the keys line and
          // refuse with the persisted-keys message — loud, and only
          // classified here when the consumption context is present
          text.contains("predates persisted keys")) &&
          (publishing.get() > 0 || branchGone() ||
            generation.get() != genAtStart ||
            fs.exists(new Path(curBr, "_publishing")) || adoptedTwin(e) ||
            // the RELEASED-retention dangle (documented on
            // releaseClone): once a branch rebucket/materialize drops
            // its `_clone_source` marker and consumer, reads of
            // history that references fork-time source dirs may find
            // them legally vacuumed — "that history belonged to the
            // source". The restore-time probe converts most of this
            // into a loud refusal; mid-read races keep the FNF.
            !fs.exists(new Path(curBr, "_clone_source"))))
    }

    /** Re-fork a consumed branch; only one thread re-creates, rivals
      * get a documented conflict (the store-level races stay real —
      * this lock only serializes the test's OWN lifecycle decision).
      */
    def ensureBranch(): Unit =
      if (branchGone()) {
        if (!recreateLock.tryLock())
          throw new java.util.ConcurrentModificationException(
            s"branch '$curBn' is being re-created; re-run")
        try {
          if (branchGone()) {
            // bump BEFORE the re-fork: an op started pre-fork must see
            // a generation change no matter when it classifies
            val g = generation.incrementAndGet()
            SnapshotStore.dropBranch(spark, root, curBn) // clear leftovers
            if (uniqueNames) curBn = s"hb$g"
            SnapshotStore.createBranch(spark, root, curBn): Unit
            opsLog.add(s"branch re-forked as $curBn at main v" +
              s"${SnapshotStore.latestVersion(spark, root)}"): Unit
          }
        } finally recreateLock.unlock()
      }

    def colsOf(table: String): Array[String] = {
      val cols = spark.table(table).columns
      if (cols.length != 2) throw new java.util.ConcurrentModificationException(
        s"$table resolved mid-swap with ${cols.length} columns; re-run")
      cols
    }
    def keyLit(cols: Array[String], rnd: scala.util.Random): String =
      if (cols.head == "k") rnd.nextInt(40).toString else s"'x${rnd.nextInt(40)}'"

    val futs = (0 until nThreads).map { t =>
      Future {
        gate.await()
        val rnd = new scala.util.Random(seed * 100 + t)
        var landed, conflicted = 0
        (1 to opsPer).foreach { i =>
          val op = rnd.nextInt(18)
          val gen0 = generation.get()
          // snapshot the addressing for THIS op: a mid-op re-fork must
          // surface as the documented consumption conflict, not as the
          // op silently moving to the successor
          val bn = curBn
          val br = curBr
          val brTable = curTable
          opsLog.add(s"t$t#$i op$op begin ($bn)"): Unit
          try {
            op match {
              case 0 => // branch INSERT
                ensureBranch()
                val cols = colsOf(brTable)
                spark.sql(s"INSERT INTO $brTable (${cols.mkString(", ")}) " +
                  s"VALUES (${keyLit(cols, rnd)}, ${rnd.nextInt(100)})")
              case 1 => // branch DELETE
                ensureBranch()
                val cols = colsOf(brTable)
                spark.sql(
                  s"DELETE FROM $brTable WHERE ${cols.head} = ${keyLit(cols, rnd)}")
              case 2 => // branch UPDATE
                ensureBranch()
                val cols = colsOf(brTable)
                spark.sql(s"UPDATE $brTable SET ${cols(1)} = ${rnd.nextInt(100)} " +
                  s"WHERE ${cols.head} = ${keyLit(cols, rnd)}")
              case 3 => // branch MERGE
                ensureBranch()
                val cols = colsOf(brTable)
                val mk = keyLit(cols, rnd)
                spark.sql(
                  s"""MERGE INTO $brTable t
                     USING (SELECT $mk AS mk, CAST(${rnd.nextInt(100)} AS BIGINT) AS mv) s
                     ON t.${cols.head} = s.mk
                     WHEN MATCHED THEN UPDATE SET ${cols(1)} = s.mv
                     WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
                       VALUES (s.mk, s.mv)""")
              case 4 => // branch compact — all three layouts (r17
                // verdict item 4): plain / clusterBy / zOrder; the
                // clustered variants rewrite sorted bucket files with
                // stats carry-over INSIDE the fork while publish /
                // re-fork / REPLACE / vacuum race them
                ensureBranch()
                rnd.nextInt(3) match {
                  case 0 => SnapshotStore.compact(spark, br): Unit
                  case 1 =>
                    val cols = colsOf(brTable)
                    // verify only a version THIS call committed (a
                    // no-op returns a rival's head — see ChaosOps)
                    val (v, committed) = SnapshotStore.compactWithStatus(
                      spark, br, clusterBy = Seq(cols.head))
                    if (committed)
                      ChaosOps.verifyClusteredCompact(spark, br, v, cols.head)
                  case _ =>
                    val cols = colsOf(brTable)
                    SnapshotStore.compact(spark, br,
                      zOrderBy = cols.toSeq): Unit
                }
              case 5 => // branch checkpoint
                ensureBranch(); SnapshotStore.checkpoint(spark, br): Unit
              case 6 => // branch vacuum — reclaim inside the fork
                ensureBranch()
                SnapshotStore.vacuum(spark, br, keepLast = 1 + rnd.nextInt(3)): Unit
              case 7 => // branch restore
                ensureBranch()
                val vs = SnapshotStore.versions(spark, br)
                if (vs.nonEmpty)
                  SnapshotStore.restore(spark, br, vs(rnd.nextInt(vs.length))): Unit
              case 8 => // branch rebucket
                ensureBranch()
                val keys = SnapshotStore.readProps(spark, br)
                  .getOrElse("keys", "k").split(",").map(_.trim).toSeq
                SnapshotStore.rebucket(spark, br, keys,
                  newNumBuckets = 1 + rnd.nextInt(4)): Unit
              case 9 => // branch tags (pin + release branch retention)
                ensureBranch()
                val tags = SnapshotStore.listTags(spark, br)
                if (tags.nonEmpty && rnd.nextBoolean())
                  SnapshotStore.dropTag(spark, br, tags(rnd.nextInt(tags.length))._1)
                else SnapshotStore.createTag(spark, br,
                  s"bt$t-${rnd.nextInt(1000000)}"): Unit
              case 10 => // branch REPLACE — a contract swap INSIDE the fork
                // (keeps the hunt's dml-mode personality across epochs)
                ensureBranch()
                val c = s"e${epochN.incrementAndGet()}t$t"
                spark.sql(s"""REPLACE TABLE $brTable
                  TBLPROPERTIES ('keys'='$c'$modeProps)
                  AS SELECT 'r' AS $c, CAST(1 AS BIGINT) AS n""")
              case 11 => // main DML under the branch's feet
                val cols = spark.table(s"$catalog.ns.$tbl").columns
                if (rnd.nextBoolean())
                  spark.sql(s"INSERT INTO $catalog.ns.$tbl (${cols.mkString(", ")}) " +
                    s"VALUES (${rnd.nextInt(40)}, ${rnd.nextInt(100)})")
                else
                  spark.sql(s"DELETE FROM $catalog.ns.$tbl WHERE ${cols.head} = " +
                    s"${rnd.nextInt(40)}")
              case 12 => // main vacuum racing the branch's retention pin
                SnapshotStore.vacuum(spark, root, keepLast = 1 + rnd.nextInt(3)): Unit
              case 13 => // main compact / checkpoint
                if (rnd.nextBoolean()) SnapshotStore.compact(spark, root): Unit
                else SnapshotStore.checkpoint(spark, root): Unit
              case 14 => // main restore (invalidates the fork base)
                val vs = SnapshotStore.versions(spark, root)
                SnapshotStore.restore(spark, root, vs(rnd.nextInt(vs.length))): Unit
              case 15 => // PUBLISH racing branch-side commits
                publishing.incrementAndGet()
                try {
                  val pub = SnapshotStore.publishBranch(spark, root, bn)
                  opsLog.add(s"t$t#$i publish of $bn landed at v$pub"): Unit
                } finally publishing.decrementAndGet()
              case 16 => // HELD relation across the chaos (r17): the
                // batch instance fence must make a stale DataFrame
                // loud-or-correct across publish+re-fork — never a
                // silent read of the successor under the predecessor's
                // schema pin. A silent cross-instance/epoch mis-bind
                // null-fills the by-name-missing key column; legit
                // hunt data never has null keys.
                ensureBranch()
                val held = spark.table(brTable)
                if (held.columns.length != 2)
                  throw new java.util.ConcurrentModificationException(
                    s"$brTable resolved mid-swap; re-run")
                Thread.sleep(5 + rnd.nextInt(30).toLong)
                val rows = held.collect()
                if (rows.nonEmpty && rows.forall(_.isNullAt(0)))
                  throw new IllegalStateException(
                    s"held relation on $bn returned ${rows.length} rows " +
                      "with an ALL-NULL key column — a silent " +
                      "cross-instance/epoch mis-bind slipped past the fence")
              case 17 => // BATCH change-feed door under the chaos (r17
                // verdict item 5): the STREAMING feed's first r16 sweep
                // found silent offset aliasing — this is the batch
                // twin. A held readChangeFeed relation binds
                // instance+epoch at creation (BatchAliasSpec 8): across
                // publish / re-fork / branch-REPLACE / vacuum it must
                // refuse or deliver real rows — never null-filled
                // garbage under a stale schema.
                val onBranch = rnd.nextBoolean()
                if (onBranch) ensureBranch()
                val feedRoot = if (onBranch) br else root
                val fkeys = SnapshotStore.readProps(spark, feedRoot)
                  .getOrElse("keys", "k").split(",").map(_.trim).toSeq
                val held = spark.read.format("graft")
                  .option("readChangeFeed", "true")
                  .option("keys", fkeys.mkString(","))
                  .option("startingVersion", "-1")
                  .option("replaceBoundary", "refresh")
                  .load(feedRoot)
                Thread.sleep(5 + rnd.nextInt(30).toLong)
                val keyIdx = held.columns.indexOf(fkeys.head)
                val rows = held.collect()
                if (keyIdx >= 0 && rows.nonEmpty &&
                    rows.forall(_.isNullAt(keyIdx)))
                  throw new IllegalStateException(
                    s"batch change feed on $feedRoot returned " +
                      s"${rows.length} rows with an ALL-NULL key column " +
                      "— a silent cross-instance/epoch mis-bind slipped " +
                      "past the CDF relation's binding")
            }
            landed += 1
            opsLog.add(s"t$t#$i op$op landed"): Unit
          } catch {
            case e: Throwable if documented(e, gen0) =>
              conflicted += 1
              opsLog.add(s"t$t#$i op$op documented conflict: " +
                s"${e.getClass.getSimpleName}: ${e.getMessage}"): Unit
            case e: Throwable =>
              val p = dump(s"thread $t op$op UNDOCUMENTED", ChaosOps.renderChain(e))
              throw new IllegalStateException(
                s"branch hunt $tbl thread $t UNDOCUMENTED failure (diag: $p)", e)
          }
        }
        (landed, conflicted)
      }
    }
    gate.countDown()
    val outcomes = Await.result(Future.sequence(futs), 1800.seconds)

    // ---------------- quiescence ----------------
    // 1. the final fork→write→publish cycle must land EXACTLY: re-fork
    //    from the current head (whatever epochs/restores the chaos
    //    left), write one row, publish, and main's head must equal the
    //    branch state captured just before the publish.
    def byName(df: org.apache.spark.sql.DataFrame): Set[Map[String, String]] = {
      val cols = df.columns
      df.collect().map(r => cols.zipWithIndex.map { case (c, idx) =>
        c -> String.valueOf(r.get(idx)) }.toMap).toSet
    }
    var attempt = 0
    var published = false
    while (!published && attempt < 6) {
      attempt += 1
      try {
        SnapshotStore.dropBranch(spark, root, curBn)
        if (uniqueNames) curBn = s"hbf$attempt"
        SnapshotStore.createBranch(spark, root, curBn): Unit
        val cols = colsOf(curTable)
        spark.sql(s"INSERT INTO $curTable (${cols.mkString(", ")}) " +
          (if (cols.head == "k") s"VALUES (990, 99)" else s"VALUES ('x990', 99)"))
        val expect = byName(spark.table(curTable).toDF())
        val pub = SnapshotStore.publishBranch(spark, root, curBn)
        val got = byName(spark.sql(
          s"SELECT * FROM $catalog.ns.$tbl VERSION AS OF $pub").toDF())
        if (got != expect) {
          val p = dump("quiescence: published state diverged",
            Seq(s"branch-only: ${expect -- got}", s"main-only: ${got -- expect}"))
          assert(false,
            s"branch hunt $tbl: published v$pub diverged from the branch " +
              s"(diag: $p)")
        }
        published = true
      } catch {
        case e: Throwable if documented(e, -1) =>
          opsLog.add(s"final publish attempt $attempt documented conflict: " +
            s"${e.getMessage}"): Unit
      }
    }
    if (!published) {
      val p = dump("quiescence: final publish never landed", Nil)
      assert(false, s"branch hunt $tbl: final publish failed 6 quiescent " +
        s"attempts (diag: $p)")
    }
    // 2. main passes the shared post-hunt sweep
    ChaosOps.assertQuiescence(spark, catalog, tbl, root, dump)
    // 3. no live branch left mid-publish
    SnapshotStore.listBranches(spark, root).foreach { case (n, _, _) =>
      if (fs.exists(new Path(SnapshotStore.branchRoot(root, n), "_publishing"))) {
        val p = dump("quiescence: live branch stuck mid-publish", Seq(n))
        assert(false, s"branch hunt $tbl: branch '$n' left mid-publish (diag: $p)")
      }
    }
    val (landed, conflicted) = (outcomes.map(_._1).sum, outcomes.map(_._2).sum)
    info(s"branch hunt $tbl: $landed landed, $conflicted documented conflicts")
    (landed, conflicted)
  }
}
