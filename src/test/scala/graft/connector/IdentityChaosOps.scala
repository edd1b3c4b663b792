package graft.connector

import java.util.concurrent.CountDownLatch

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.store.SnapshotStore

/** IDENTITY-LEDGER chaos (r16 verdict item 3): identity minting — the
  * reference's AUTOINCREMENT surrogate keys (`09 Order Entity.sql:71`)
  * — had only raced the hunts through the WAP op's happy path. This
  * hunt races the block allocator (`_identity/<col>/block-*` ledger)
  * through its full adversarial surface: concurrent main inserts
  * minting blocks, BRANCH inserts minting from the fork's CLONED
  * ledger (the clone starts at the fork-time frontier — the exact
  * overlap window), publishes burning branch frontiers into main's
  * ledger mid-mint, re-forks, restores resurrecting old rows while
  * the ledger stays high, vacuum/compact/checkpoint churn, and
  * delete/update rewrites that must CARRY existing ids (under both
  * dml modes — cow bucket rewrites and delta WriteDelta staging), and
  * (r17 verdict item 1) REPLACE on main AND on the branch re-declaring
  * the identity column — the ledger ARCHIVE/INSTALL path
  * (`_identity_upto_*` / certificate install, the exact shape the
  * reference uses everywhere: AUTOINCREMENT `09 Order Entity.sql:71`
  * inside CREATE-OR-REPLACE procs `02 Location Entity.sql:282-343`)
  * racing the minting fleet for the first time.
  *
  * THE invariant (AUTOINCREMENT's one promise): no committed state —
  * any retained version of main, ever — holds two rows with the same
  * minted id, and the ledger frontier stays strictly above every id
  * observed in its OWN epoch (a REPLACE restarts numbering by design,
  * like the reference's CREATE-OR-REPLACE; a cross-epoch restore
  * re-installs that epoch's archived ledger, keeping the pairing).
  * Gaps are legal and expected (aborted writes, burned publish
  * frontiers); density is explicitly NOT promised.
  */
object IdentityChaosOps {

  /** Runs one identity hunt; returns (landed, documented conflicts). */
  def hunt(spark: SparkSession, catalog: String, warehouse: String,
           tbl: String, seed: Int, nThreads: Int, opsPer: Int,
           info: String => Unit, uniqueNames: Boolean = false,
           dmlMode: String = "cow"): (Int, Int) = {
    val root = s"$warehouse/ns/$tbl"
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val modeProps = if (dmlMode == "delta") ", 'dml.mode'='delta'" else ""
    spark.sql(s"""CREATE TABLE $catalog.ns.$tbl (
                    sid BIGINT GENERATED ALWAYS AS IDENTITY,
                    k BIGINT, v BIGINT) USING graft
                  TBLPROPERTIES ('keys'='k', 'numBuckets'='2'$modeProps)""")
    spark.sql(s"INSERT INTO $catalog.ns.$tbl (k, v) SELECT id, id FROM range(0, 10)")
    val bcat = s"${catalog}id${tbl.filter(_.isLetterOrDigit)}"
    spark.conf.set(s"spark.sql.catalog.$bcat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$bcat.root", root)

    val generation = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var curBn: String = if (uniqueNames) "ib0" else "ib"
    def curBr: String = SnapshotStore.branchRoot(root, curBn)
    def curTable: String = s"$bcat.`_branch`.$curBn"
    SnapshotStore.createBranch(spark, root, curBn): Unit

    val publishing = new java.util.concurrent.atomic.AtomicInteger(0)
    val replacing = new java.util.concurrent.atomic.AtomicInteger(0)
    val recreateLock = new java.util.concurrent.locks.ReentrantLock()
    val gate = new CountDownLatch(1)
    val opsLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def dump(reason: String, extra: Seq[String]): String =
      ChaosOps.dumpDiagnostics(s"idhunt-$tbl",
        s"reason: $reason" +: s"seed: $seed" +:
          s"main versions: ${scala.util.Try(SnapshotStore.versions(spark, root)).toOption}" +:
          s"branch ($curBn) versions: ${scala.util.Try(SnapshotStore.versions(spark, curBr)).toOption}" +:
          (opsLog.toArray(Array.empty[String]).toSeq.map("op: " + _) ++ extra))

    def chainText(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => s"${x.getClass.getName}: ${x.getMessage}").mkString("\n")

    def branchGone(): Boolean =
      scala.util.Try(SnapshotStore.versions(spark, curBr)).toOption
        .forall(_.isEmpty)

    def documented(e: Throwable, genAtStart: Int): Boolean = {
      val text = chainText(e)
      ChaosOps.documented(e) ||
        ChaosOps.vacuumRace(spark, root, e) ||
        ChaosOps.vacuumRace(spark, curBr, e) ||
        text.contains("no committed graft table") ||
        text.contains("no table at") ||
        text.contains("nothing to clone") ||
        text.contains("no branch '") ||
        text.contains("NoSuchTableException") ||
        text.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        text.contains("being re-created") ||
        // the batch-CDF op's documented refusals (see BranchChaosOps)
        text.contains("was vacuumed — register a consumer") ||
        text.contains("crosses a REPLACE TABLE boundary") ||
        ((text.contains("does not exist") || text.contains("FileNotFound") ||
          text.contains("No such file") || text.contains("NoSuchFile") ||
          text.contains("Failed to rename") ||
          text.contains("TASK_WRITE_FAILED")) &&
          (publishing.get() > 0 || replacing.get() > 0 || branchGone() ||
            generation.get() != genAtStart ||
            fs.exists(new Path(curBr, "_publishing")) ||
            !fs.exists(new Path(curBr, "_clone_source"))))
    }

    def ensureBranch(): Unit =
      if (branchGone()) {
        if (!recreateLock.tryLock())
          throw new java.util.ConcurrentModificationException(
            s"branch '$curBn' is being re-created; re-run")
        try {
          if (branchGone()) {
            val g = generation.incrementAndGet()
            SnapshotStore.dropBranch(spark, root, curBn)
            if (uniqueNames) curBn = s"ib$g"
            SnapshotStore.createBranch(spark, root, curBn): Unit
            opsLog.add(s"branch re-forked as $curBn at main v" +
              s"${SnapshotStore.latestVersion(spark, root)}"): Unit
          }
        } finally recreateLock.unlock()
      }

    val futs = (0 until nThreads).map { t =>
      Future {
        gate.await()
        val rnd = new scala.util.Random(seed * 100 + t)
        var landed, conflicted = 0
        (1 to opsPer).foreach { i =>
          val op = rnd.nextInt(15)
          val gen0 = generation.get()
          val bn = curBn
          val brTable = curTable
          opsLog.add(s"t$t#$i op$op begin ($bn)"): Unit
          try {
            op match {
              case 0 | 1 | 2 => // main single-row mint
                spark.sql(s"INSERT INTO $catalog.ns.$tbl (k, v) " +
                  s"VALUES (${rnd.nextInt(40)}, ${rnd.nextInt(100)})")
              case 3 => // main block mint (multi-row)
                val lo = rnd.nextInt(40)
                spark.sql(s"INSERT INTO $catalog.ns.$tbl (k, v) " +
                  s"SELECT id, id FROM range($lo, ${lo + 2 + rnd.nextInt(6)})")
              case 4 => // branch single-row mint (cloned-ledger frontier)
                ensureBranch()
                spark.sql(s"INSERT INTO $brTable (k, v) " +
                  s"VALUES (${rnd.nextInt(40)}, ${rnd.nextInt(100)})")
              case 5 => // branch block mint
                ensureBranch()
                val lo = rnd.nextInt(40)
                spark.sql(s"INSERT INTO $brTable (k, v) " +
                  s"SELECT id, id FROM range($lo, ${lo + 2 + rnd.nextInt(6)})")
              case 6 => // PUBLISH racing in-flight mints on both sides
                publishing.incrementAndGet()
                try {
                  val pub = SnapshotStore.publishBranch(spark, root, bn)
                  opsLog.add(s"t$t#$i publish of $bn landed at v$pub"): Unit
                } finally publishing.decrementAndGet()
              case 7 => // main vacuum
                SnapshotStore.vacuum(spark, root, keepLast = 1 + rnd.nextInt(3)): Unit
              case 8 => // main compact / checkpoint
                if (rnd.nextBoolean()) SnapshotStore.compact(spark, root): Unit
                else SnapshotStore.checkpoint(spark, root): Unit
              case 9 => // main restore: old rows return, ledger stays high
                val vs = SnapshotStore.versions(spark, root)
                SnapshotStore.restore(spark, root, vs(rnd.nextInt(vs.length))): Unit
              case 10 => // branch maintenance
                ensureBranch()
                if (rnd.nextBoolean())
                  SnapshotStore.vacuum(spark, curBr, keepLast = 1 + rnd.nextInt(3)): Unit
                else {
                  val vs = SnapshotStore.versions(spark, curBr)
                  if (vs.nonEmpty)
                    SnapshotStore.restore(spark, curBr, vs(rnd.nextInt(vs.length))): Unit
                }
              case 11 => // rewrite carrying ids through (cow/delta paths)
                if (rnd.nextBoolean())
                  spark.sql(s"DELETE FROM $catalog.ns.$tbl WHERE k = ${rnd.nextInt(40)}")
                else
                  spark.sql(s"UPDATE $catalog.ns.$tbl SET v = ${rnd.nextInt(100)} " +
                    s"WHERE k = ${rnd.nextInt(40)}")
              case 12 => // MAIN REPLACE re-declaring the identity column
                // (r17 verdict item 1 — the reference's default shape:
                // AUTOINCREMENT inside CREATE-OR-REPLACE procs). The
                // swap ARCHIVES the live ledger and installs the new
                // declaration's, racing the whole minting fleet; the
                // new epoch restarts numbering at 1, so any old-ledger
                // mint leaking into the new epoch eventually collides
                // — the per-version duplicate sweep catches exactly
                // that, and the frontier check below is epoch-scoped.
                replacing.incrementAndGet()
                try
                  spark.sql(s"""REPLACE TABLE $catalog.ns.$tbl (
                      sid BIGINT GENERATED ALWAYS AS IDENTITY,
                      k BIGINT, v BIGINT) USING graft
                    TBLPROPERTIES ('keys'='k', 'numBuckets'='2'$modeProps)""")
                finally replacing.decrementAndGet()
              case 13 => // BRANCH REPLACE re-declaring identity: the
                // branch-local swap archives/installs the CLONED
                // ledger, and a later publish must burn the REPLACED
                // branch's frontier (or refuse on the contract
                // mismatch) — the pending-ledger install path raced
                ensureBranch()
                replacing.incrementAndGet()
                try
                  spark.sql(s"""REPLACE TABLE $brTable (
                      sid BIGINT GENERATED ALWAYS AS IDENTITY,
                      k BIGINT, v BIGINT) USING graft
                    TBLPROPERTIES ('keys'='k', 'numBuckets'='2'$modeProps)""")
                finally replacing.decrementAndGet()
              case 14 => // batch CDF over the MINTED ids across REPLACE
                // epochs (r18, pulled forward from the R19 list): a
                // feed consumer observing identity rows while the
                // ledger is archived/installed and epochs restart —
                // must refuse with the documented CMEs or deliver rows
                // whose sid column is real minted data (identity rows
                // never have null sids in any epoch of this hunt's
                // shape-keeping REPLACEs)
                val held = spark.read.format("graft")
                  .option("readChangeFeed", "true").option("keys", "k")
                  .option("startingVersion", "-1")
                  .option("replaceBoundary", "refresh").load(root)
                Thread.sleep(5 + rnd.nextInt(30).toLong)
                val sidIdx = held.columns.indexOf("sid")
                val rows = held.collect()
                if (sidIdx >= 0 && rows.nonEmpty &&
                    rows.forall(_.isNullAt(sidIdx)))
                  throw new IllegalStateException(
                    s"batch change feed on $root returned ${rows.length} " +
                      "rows with an ALL-NULL sid column — a silent " +
                      "cross-epoch mis-bind of minted identity rows")
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
                s"identity hunt $tbl thread $t UNDOCUMENTED failure (diag: $p)", e)
          }
        }
        (landed, conflicted)
      }
    }
    gate.countDown()
    val outcomes = Await.result(Future.sequence(futs), 1800.seconds)

    // ---------------- quiescence ----------------
    // 1. one final clean fork→mint→publish must land
    var attempt = 0
    var published = false
    while (!published && attempt < 6) {
      attempt += 1
      try {
        SnapshotStore.dropBranch(spark, root, curBn)
        if (uniqueNames) curBn = s"ibf$attempt"
        SnapshotStore.createBranch(spark, root, curBn): Unit
        spark.sql(s"INSERT INTO $curTable (k, v) VALUES (990, 99)")
        SnapshotStore.publishBranch(spark, root, curBn): Unit
        published = true
      } catch {
        case e: Throwable if documented(e, -1) =>
          opsLog.add(s"final publish attempt $attempt documented conflict: " +
            s"${e.getMessage}"): Unit
      }
    }
    if (!published) {
      val p = dump("quiescence: final publish never landed", Nil)
      assert(false, s"identity hunt $tbl: final publish failed 6 quiescent " +
        s"attempts (diag: $p)")
    }
    // 2. THE invariant: no retained version of main ever holds a
    //    duplicate minted id. Valid ACROSS epochs — each version is one
    //    consistent state, and an old-ledger mint leaking past a
    //    REPLACE into the new epoch surfaces here once the restarted
    //    ledger reaches the leaked id.
    var maxSid = Long.MinValue
    val epoch = SnapshotStore.readProps(spark, root)
      .get("graft.schema.epoch").map(_.toLong).getOrElse(-1L)
    SnapshotStore.versions(spark, root).foreach { v =>
      val sids =
        try SnapshotStore.readVersion(spark, root, v)
          .select("sid").collect().map(_.getLong(0)).toSeq
        catch { case _: Throwable => Seq.empty } // racing nothing now; vacuumed base
      val dups = sids.groupBy(identity).filter(_._2.length > 1).keys.toSeq
      if (dups.nonEmpty) {
        val p = dump(s"DUPLICATE identity ids in main v$v", Seq(s"dups: $dups"))
        assert(false, s"identity hunt $tbl: main v$v holds duplicate " +
          s"minted ids $dups (diag: $p)")
      }
      // frontier comparison is EPOCH-scoped: a REPLACE restarts
      // numbering by design (the reference's CREATE-OR-REPLACE +
      // AUTOINCREMENT restarts too), so only the CURRENT epoch's
      // versions bound the live ledger — a cross-epoch restore
      // re-stamps the epoch AND re-installs that epoch's archived
      // ledger, so the pairing stays consistent under every op mix
      if (v >= epoch && sids.nonEmpty) maxSid = math.max(maxSid, sids.max)
    }
    // 3. the ledger frontier sits strictly ABOVE every id observed in
    //    its OWN epoch: the next mint can never duplicate
    val next = SnapshotStore.reserveIdentity(spark, root, "sid", 1L)
    if (maxSid != Long.MinValue && next <= maxSid) {
      val p = dump("ledger frontier BELOW observed ids",
        Seq(s"next: $next", s"maxSid: $maxSid", s"epoch: $epoch"))
      assert(false, s"identity hunt $tbl: ledger would re-mint ids " +
        s"<= $maxSid (next=$next, epoch=$epoch) (diag: $p)")
    }
    // 4. every retained version reads as the identity-shaped frame
    //    through the SQL door (the shared sweep asserts a two-column
    //    hunt table; this hunt's is three-column, so sweep directly —
    //    the REPLACE ops re-declare the SAME shape, so pre-epoch
    //    versions resolve their archived (identical) schema)
    SnapshotStore.versions(spark, root).foreach { v =>
      val df = spark.sql(s"SELECT * FROM $catalog.ns.$tbl VERSION AS OF $v")
      if (df.columns.toSeq != Seq("sid", "k", "v")) {
        val p = dump(s"quiescence: v$v wrong shape", Seq(df.columns.mkString(",")))
        assert(false, s"identity hunt $tbl: v$v resolved with columns " +
          s"${df.columns.toSeq} (diag: $p)")
      }
      df.collect(): Unit
    }
    val (landed, conflicted) = (outcomes.map(_._1).sum, outcomes.map(_._2).sum)
    info(s"identity hunt $tbl: $landed landed, $conflicted documented conflicts")
    (landed, conflicted)
  }
}
