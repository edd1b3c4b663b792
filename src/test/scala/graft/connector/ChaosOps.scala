package graft.connector

import java.util.concurrent.CountDownLatch

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.store.SnapshotStore

/** The contract-op chaos body shared by [[ChaosHuntSpec]] (POSIX
  * warehouse) and ObjectStoreSemanticsSpec (osim:// warehouse): N
  * seeded threads racing random streams of inserts, MoR deletes, SQL
  * UPDATEs and MERGEs, schema-changing REPLACEs, restores, compactions,
  * tag create/drop, checkpoints, vacuums, rebuckets, and WAP branch
  * fork→write→publish cycles against ONE catalog table, then the
  * quiescence invariants — epoch stamp at the newest flagged version,
  * every retained version a readable two-column time-travel frame,
  * zero unconsumed write-ahead bundles. Extracting it keeps the op
  * vocabulary identical across filesystems, so an osim-only failure
  * isolates an object-store-semantics hole, not a different workload.
  *
  * The R15.2 vocabulary widening (vacuum / drop-tag / UPDATE / MERGE /
  * rebucket) follows the streaming hunt's lesson: vacuum-in-the-mix
  * found three real bugs at intensities the vacuum-free mix had
  * already passed.
  */
object ChaosOps {

  /** Persist a chaos-failure diagnostic bundle (op log, states,
    * exception chains) under `target/chaos-diag/` and return its path —
    * the flake-ledger lesson: a convergence test that fails once
    * WITHOUT capturing its diff is undiagnosable on recurrence, so
    * every chaos assert routes its evidence through here before
    * failing.
    */
  def dumpDiagnostics(tag: String, lines: Seq[String]): String = {
    val dir = java.nio.file.Paths.get("target", "chaos-diag")
    java.nio.file.Files.createDirectories(dir)
    val f = dir.resolve(s"$tag-${System.nanoTime()}.txt")
    java.nio.file.Files.write(f,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f.toAbsolutePath.toString
  }

  /** Render a throwable chain (messages + the failure site frames) for
    * the diagnostic bundle.
    */
  def renderChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).toSeq
      .flatMap { x =>
        s"${x.getClass.getName}: ${x.getMessage}" +:
          x.getStackTrace.take(6).map("    at " + _).toSeq
      }

  def documented(e: Throwable): Boolean = {
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .take(6).toSeq
    chain.exists {
      case _: java.util.ConcurrentModificationException => true
      case x => x.getClass.getName.contains("AnalysisException") ||
        x.getMessage != null &&
          (x.getMessage.contains("UNRESOLVED_COLUMN") ||
           x.getMessage.contains("cannot be resolved") ||
           x.getMessage.contains("not enough data columns") ||
           // a stale plan executing across an epoch flip fails the
           // ANSI cast of the old epoch's literals — loud, documented
           x.getMessage.contains("CAST_INVALID_INPUT") ||
           // a restore landing between a mutator's versions() listing
           // and its own restore call prunes nothing, but a racer's
           // restore target can vanish from the retained list
           x.getMessage.contains("not in") ||
           // a stale plan executing across an epoch flip on a DELTA
           // table null-fills the vanished key column and trips the
           // write-side non-null merge-key guard — the guard firing
           // IS the documented loud behavior (r16 delta personality)
           (x.getMessage.contains("null merge key") &&
             x.getMessage.contains("rejected")) ||
           x.getMessage.contains("lost") && x.getMessage.contains("race"))
    }
  }

  /** A task/driver FileNotFound under `root` is a DOCUMENTED
    * concurrent-vacuum loss IFF the missing file's version dir is no
    * longer referenced by ANY retained manifest: a reader pinned a
    * snapshot, rivals advanced the head, vacuum (running with the
    * harness's zero age floor) legally reclaimed the pinned snapshot's
    * files mid-scan. The check is exact, not a heuristic — a missing
    * file whose dir IS still referenced stays UNDOCUMENTED, because
    * that is vacuum deleting live data (the bug class the hunts
    * exist to catch). Clone-style absolute-path references are not
    * handled (no clone op in the mix).
    */
  def vacuumRace(spark: SparkSession, root: String, e: Throwable): Boolean = {
    val text = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .flatMap(x => Option(x.getMessage)).mkString("\n")
    val rx = """(v=[^/\s]+/[^/\s]+)/[^/\s]+\.parquet does not exist""".r
    val rels = rx.findAllMatchIn(text).map(_.group(1)).toSeq
    if (rels.isEmpty) return false
    val referenced: Set[String] =
      try SnapshotStore.versions(spark, root).flatMap { v =>
        SnapshotStore.readManifest(spark, root, v).buckets.values
          .flatMap(en => en.dir +: en.tombstones)
      }.toSet
      catch { case _: Throwable => return false }
    rels.forall(r => !referenced.contains(r))
  }

  /** Runs one hunt round; returns (landed, documented conflicts).
    * `catalog` must already be registered over `warehouse`; the table
    * `<catalog>.ns.<tbl>` is created here and chaosed in place.
    */
  def hunt(spark: SparkSession, catalog: String, warehouse: String,
           tbl: String, seed: Int, nThreads: Int, opsPer: Int,
           info: String => Unit, dmlMode: String = "cow"): (Int, Int) = {
    val root = s"$warehouse/ns/$tbl"
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // `dmlMode = "delta"` is a table PERSONALITY for the whole hunt
    // (r15 verdict item #2): the O(changed-rows) WriteDelta staging,
    // runtime-filter bucket narrowing and tombstone DELETEs then take
    // every UPDATE/DELETE/MERGE in the mix, racing the same vacuum /
    // REPLACE / rebucket / restore vocabulary the CoW path survives.
    val modeProps = if (dmlMode == "delta") ", 'dml.mode'='delta'" else ""
    // statsCols declared so the clustered-compact ops exercise REAL
    // stats carry-over (writes census per-bucket/per-file min/max of k
    // under the whole op mix); the REPLACE op re-declares without it —
    // both personalities stay covered
    spark.sql(s"""CREATE TABLE $catalog.ns.$tbl (k BIGINT, v BIGINT) USING graft
                  TBLPROPERTIES ('keys'='k', 'numBuckets'='2',
                                 'statsCols'='k'$modeProps)""")
    spark.sql(s"INSERT INTO $catalog.ns.$tbl VALUES (1, 0)")
    val epochN = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new CountDownLatch(1)
    // self-diagnosing like StreamChaosOps: any failure — mid-chaos
    // undocumented throw or quiescence-invariant breach — persists the
    // op journal before the assert fires (the flake-ledger lesson)
    val opsLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def dump(reason: String, extra: Seq[String]): String =
      dumpDiagnostics(s"hunt-$tbl",
        s"reason: $reason" +: s"seed: $seed" +:
          s"versions: ${scala.util.Try(SnapshotStore.versions(spark, root)).toOption}" +:
          (opsLog.toArray(Array.empty[String]).toSeq.map("op: " + _) ++ extra))
    val futs = (0 until nThreads).map { t =>
      Future {
        gate.await()
        val rnd = new scala.util.Random(seed * 100 + t)
        var landed, conflicted = 0
        (1 to opsPer).foreach { i =>
          val op = rnd.nextInt(15)
          opsLog.add(s"t$t#$i op$op begin"): Unit
          try {
            op match {
              case 0 =>
                val cols = spark.table(s"$catalog.ns.$tbl").columns
                if (cols.isEmpty) throw new java.util.ConcurrentModificationException(
                  s"$tbl resolved mid-swap with no columns; re-run")
                val key =
                  if (cols.head == "k") rnd.nextInt(40).toString
                  else s"'x${rnd.nextInt(40)}'"
                spark.sql(s"INSERT INTO $catalog.ns.$tbl (${cols.mkString(", ")}) " +
                  s"VALUES ($key, ${rnd.nextInt(100)})")
              case 1 =>
                val cols = spark.table(s"$catalog.ns.$tbl").columns
                if (cols.isEmpty) throw new java.util.ConcurrentModificationException(
                  s"$tbl resolved mid-swap with no columns; re-run")
                spark.sql(s"DELETE FROM $catalog.ns.$tbl WHERE ${cols.head} = " +
                  (if (cols.head == "k") rnd.nextInt(40).toString
                   else s"'x${rnd.nextInt(40)}'"))
              case 2 =>
                val c = s"e${epochN.incrementAndGet()}t$t"
                spark.sql(s"""REPLACE TABLE $catalog.ns.$tbl
                  TBLPROPERTIES ('keys'='$c'$modeProps)
                  AS SELECT 'r' AS $c, CAST(1 AS BIGINT) AS n""")
              case 3 =>
                val vs = SnapshotStore.versions(spark, root)
                SnapshotStore.restore(spark, root,
                  vs(rnd.nextInt(vs.length))): Unit
              case 4 =>
                // compaction in ALL THREE layouts (r17 verdict item
                // 4): plain merge, clusterBy (sorted bucket files),
                // zOrder (Morton codes). The clustered variants rewrite
                // SORTED bucket files with stats carry-over and had
                // never been in the chaos vocabulary — verify the
                // layout invariants on the result version in-op.
                rnd.nextInt(3) match {
                  case 0 => SnapshotStore.compact(spark, root): Unit
                  case 1 =>
                    val cols = spark.table(s"$catalog.ns.$tbl").columns
                    if (cols.isEmpty)
                      throw new java.util.ConcurrentModificationException(
                        s"$tbl resolved mid-swap with no columns; re-run")
                    // verify ONLY a version THIS call committed: a
                    // nothing-fragmented no-op returns a rival's head,
                    // whose v=<v>- dirs are a rival's layout (found by
                    // this op's own first sweep, seed 47)
                    val (v, committed) = SnapshotStore.compactWithStatus(
                      spark, root, clusterBy = Seq(cols.head))
                    if (committed)
                      verifyClusteredCompact(spark, root, v, cols.head)
                  case _ =>
                    val cols = spark.table(s"$catalog.ns.$tbl").columns
                    if (cols.isEmpty)
                      throw new java.util.ConcurrentModificationException(
                        s"$tbl resolved mid-swap with no columns; re-run")
                    SnapshotStore.compact(spark, root,
                      zOrderBy = cols.toSeq): Unit
                }
              case 5 =>
                // tags pin retention (vacuum stretches to the oldest
                // one), so the mix must also RELEASE them or op 8
                // would degrade to a permanent no-op
                val tags = SnapshotStore.listTags(spark, root)
                if (tags.nonEmpty && rnd.nextBoolean())
                  SnapshotStore.dropTag(spark, root,
                    tags(rnd.nextInt(tags.length))._1)
                else SnapshotStore.createTag(spark, root,
                  s"$tbl-t$t-${rnd.nextInt(1000000)}"): Unit
              case 6 => SnapshotStore.checkpoint(spark, root): Unit
              case 7 => // WAP under chaos: fork, one-row write, publish
                val bn = s"b$tbl-$t-${rnd.nextInt(1000000)}"
                SnapshotStore.createBranch(spark, root, bn)
                try {
                  val br = SnapshotStore.branchRoot(root, bn)
                  val schema = SnapshotStore.read(spark, br).schema
                  if (schema.nonEmpty) {
                    val vals: Seq[Any] = schema.fields.toSeq.map { f =>
                      if (f.dataType ==
                          org.apache.spark.sql.types.LongType)
                        Long.box(rnd.nextInt(100).toLong)
                      else s"w${rnd.nextInt(40)}"
                    }
                    val delta = spark.createDataFrame(
                      java.util.List.of(org.apache.spark.sql.Row.fromSeq(vals)),
                      schema)
                    SnapshotStore.commitDelta(spark, br, delta,
                      Seq(schema.fields.head.name),
                      SnapshotStore.upsertMerge(Seq(schema.fields.head.name)))
                  }
                  SnapshotStore.publishBranch(spark, root, bn): Unit
                } catch { case e: Throwable =>
                  // a refused publish (main advanced / contracts moved)
                  // leaves the branch — release its retention pin
                  try SnapshotStore.dropBranch(spark, root, bn)
                  catch { case _: Throwable => () }
                  throw e
                }
              case 8 =>
                // vacuum IN the mix (the streaming hunt's vacuum ops
                // found three real bugs in r15): reclaim while rivals
                // restore / tag / publish / rewrite
                SnapshotStore.vacuum(spark, root,
                  keepLast = 1 + rnd.nextInt(3)): Unit
              case 9 =>
                val cols = spark.table(s"$catalog.ns.$tbl").columns
                if (cols.length != 2) throw new java.util.ConcurrentModificationException(
                  s"$tbl resolved mid-swap with ${cols.length} columns; re-run")
                spark.sql(s"UPDATE $catalog.ns.$tbl SET ${cols(1)} = " +
                  s"${rnd.nextInt(100)} WHERE ${cols.head} = " +
                  (if (cols.head == "k") rnd.nextInt(40).toString
                   else s"'x${rnd.nextInt(40)}'"))
              case 10 =>
                val cols = spark.table(s"$catalog.ns.$tbl").columns
                if (cols.length != 2) throw new java.util.ConcurrentModificationException(
                  s"$tbl resolved mid-swap with ${cols.length} columns; re-run")
                val mk = if (cols.head == "k") rnd.nextInt(40).toString
                         else s"'x${rnd.nextInt(40)}'"
                spark.sql(
                  s"""MERGE INTO $catalog.ns.$tbl t
                     USING (SELECT $mk AS mk, CAST(${rnd.nextInt(100)} AS BIGINT) AS mv) s
                     ON t.${cols.head} = s.mk
                     WHEN MATCHED THEN UPDATE SET ${cols(1)} = s.mv
                     WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
                       VALUES (s.mk, s.mv)""")
              case 11 =>
                // bucket-count evolution racing everything else; keys
                // come from the live props, so a REPLACE landing in
                // between surfaces as a documented key/column conflict
                val keys = SnapshotStore.readProps(spark, root)
                  .getOrElse("keys", "k").split(",").map(_.trim).toSeq
                SnapshotStore.rebucket(spark, root, keys,
                  newNumBuckets = 1 + rnd.nextInt(4)): Unit
              case 12 =>
                // zero-copy clone under chaos: the fork must be
                // internally coherent (a readable two-column frame) no
                // matter what swaps/vacuums/rebuckets race the fork;
                // the retention pin is released right after so vacuum
                // coverage survives the hunt
                val cRoot = s"$warehouse/ns/${tbl}_c$t${rnd.nextInt(1000000)}"
                SnapshotStore.cloneTable(spark, root, cRoot): Unit
                try {
                  val df = SnapshotStore.read(spark, cRoot)
                  if (df.columns.length != 2)
                    throw new IllegalStateException(
                      s"frankenclone at $cRoot: ${df.columns.toSeq}")
                  df.count(): Unit
                } finally SnapshotStore.releaseClone(spark, cRoot)
              case 13 =>
                // version-less DDL racing everything else: the
                // contracts lock must keep SET TBLPROPERTIES both
                // lossless vs rival ALTERs and serialized vs swaps
                spark.sql(s"ALTER TABLE $catalog.ns.$tbl SET TBLPROPERTIES " +
                  s"('cx${t}_${rnd.nextInt(1000000)}'='1')")
              case 14 =>
                // HELD relation across the chaos (r17): the batch
                // EPOCH fence must make a stale DataFrame across a
                // REPLACE/cross-epoch restore loud-or-correct — never
                // a silent by-name read of the new epoch under the old
                // schema (which null-fills the vanished key column;
                // legit hunt data never has null keys). Half the draws
                // resolve through the PATH door (r18): that resolution
                // crosses Spark's separate inferSchema->getTable calls,
                // so it races the resolution-pin handoff that pairs
                // the bound stamp/instance with the pinned schema.
                val held =
                  if (rnd.nextBoolean()) spark.table(s"$catalog.ns.$tbl")
                  else spark.read.format("graft").load(root)
                if (held.columns.length != 2)
                  throw new java.util.ConcurrentModificationException(
                    s"$tbl resolved mid-swap; re-run")
                Thread.sleep(5 + rnd.nextInt(30).toLong)
                val rows = held.collect()
                if (rows.nonEmpty && rows.forall(_.isNullAt(0)))
                  throw new IllegalStateException(
                    s"held relation on $tbl returned ${rows.length} rows " +
                      "with an ALL-NULL key column — a silent cross-epoch " +
                      "mis-bind slipped past the fence")
            }
            landed += 1
            opsLog.add(s"t$t#$i op$op landed"): Unit
          } catch {
            case e: Throwable if documented(e) || vacuumRace(spark, root, e) =>
              conflicted += 1
              opsLog.add(s"t$t#$i op$op documented conflict: " +
                s"${e.getClass.getSimpleName}: ${e.getMessage}"): Unit
            case e: Throwable =>
              val p = dump(s"thread $t op$op UNDOCUMENTED", renderChain(e))
              throw new IllegalStateException(
                s"hunt $tbl thread $t UNDOCUMENTED failure (diag: $p)", e)
          }
        }
        (landed, conflicted)
      }
    }
    gate.countDown()
    val outcomes = Await.result(Future.sequence(futs), 1800.seconds)
    // quiesce, then sweep
    spark.sql(s"ALTER TABLE $catalog.ns.$tbl SET TBLPROPERTIES ('cq'='1')")
    assertQuiescence(spark, catalog, tbl, root, dump)
    val (landed, conflicted) = (outcomes.map(_._1).sum, outcomes.map(_._2).sum)
    info(s"hunt $tbl: $landed landed, $conflicted documented conflicts")
    (landed, conflicted)
  }

  /** Post-`compact(clusterBy)` layout invariants, verified IN the
    * chaos (r17 verdict item 4), shared with [[BranchChaosOps]]:
    *
    *  (a) every data file the compact REWROTE (dirs under `v=<v>-…`)
    *      is internally SORTED by the cluster column — the whole point
    *      of the layout (tight row-group min/max);
    *  (b) when the table declares stats columns, the result version's
    *      manifest stats still BOUND its data: pruning a point read at
    *      the version's observed minimum must lose nothing (carried
    *      stats may stay conservative, never too tight).
    *
    * Racing vacuum/restore/publish can legally reclaim version v's
    * files mid-verify — those READ failures rethrow as the documented
    * CME; only a readable-but-wrong layout is a breach.
    */
  def verifyClusteredCompact(spark: SparkSession, root: String, v: Long,
                             clusterCol: String): Unit = {
    def raced(e: Throwable) = new java.util.ConcurrentModificationException(
      s"clustered-compact verify at $root v$v raced maintenance churn " +
        s"(${e.getClass.getSimpleName}: ${e.getMessage}); re-run")
    val m = try SnapshotStore.readManifest(spark, root, v)
      catch { case e: Throwable => throw raced(e) }
    // (a) sortedness of the rewritten files only — untouched buckets
    // legitimately keep their old (unsorted) files
    m.buckets.foreach { case (b, e) =>
      if (e.dir.contains(s"v=$v-")) {
        val dir = SnapshotStore.dataPath(root, e.dir)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val files =
          try fs.listStatus(dir).filter(st => st.isFile &&
            !st.getPath.getName.startsWith("_")).map(_.getPath).toSeq
          catch { case e2: Throwable => throw raced(e2) }
        files.foreach { f =>
          val vals =
            try spark.read.parquet(f.toString)
              .select(clusterCol).collect().map(_.get(0))
            catch { case e2: Throwable => throw raced(e2) }
          val unsorted = vals.iterator.sliding(2).withPartial(false).exists {
            case Seq(a, bb) => a != null && (bb == null ||
              a.asInstanceOf[Comparable[Any]].compareTo(bb) > 0)
            case _ => false
          }
          if (unsorted) throw new IllegalStateException(
            s"clustered compact at $root wrote an UNSORTED file $f " +
              s"(bucket $b, cluster column $clusterCol) — the sorted " +
              "layout contract broke under churn")
        }
      }
    }
    // (b) stats still bound the data: a point read at the version's
    // observed min, pruned by the manifest stats, must find every row
    // the unpruned version read finds (tombstone-carrying buckets can
    // only ADD rows to the raw pruned read — never hide one)
    if (m.statsCols.exists(_._1 == clusterCol)) {
      val (truth, loOpt) =
        try {
          val df = SnapshotStore.readVersion(spark, root, v)
          val mm = df.agg(org.apache.spark.sql.functions.min(
            org.apache.spark.sql.functions.col(clusterCol))).collect().head
          if (mm.isNullAt(0)) (0L, None)
          else (df.filter(org.apache.spark.sql.functions.col(clusterCol) ===
            mm.get(0)).count(), Some(mm.get(0)))
        } catch { case e2: Throwable => throw raced(e2) }
      loOpt.foreach { lo =>
        val kept = SnapshotStore.pruneBuckets(m, clusterCol, lo, lo)
        val rawKept =
          try {
            val dirs = kept.toSeq.sorted.map(b =>
              SnapshotStore.dataPath(root, m.buckets(b).dir).toString)
            if (dirs.isEmpty) 0L
            else spark.read.option("mergeSchema", "true").parquet(dirs: _*)
              .filter(org.apache.spark.sql.functions.col(clusterCol) === lo)
              .count()
          } catch { case e2: Throwable => throw raced(e2) }
        if (rawKept < truth) throw new IllegalStateException(
          s"clustered compact at $root v$v: stats pruning at " +
            s"$clusterCol=$lo keeps $rawKept rows but the version holds " +
            s"$truth — carried-over stats tightened below reality")
      }
    }
  }

  /** The post-hunt quiescence invariants, shared with the branch hunt
    * ([[BranchChaosOps]]): epoch stamp at the newest retained flagged
    * version, every retained version a readable two-column time-travel
    * frame, zero unconsumed write-ahead bundles.
    */
  def assertQuiescence(spark: SparkSession, catalog: String, tbl: String,
                       root: String,
                       dump: (String, Seq[String]) => String): Unit = {
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stampedOpt = SnapshotStore.readProps(spark, root)
      .get("graft.schema.epoch").map(_.toLong)
    val epochRow = spark.sql(
      s"""SELECT max(version) FROM $catalog.ns.$tbl.meta_history
         WHERE is_epoch_start""").collect().head
    // vacuum in the mix means the newest flagged epoch-start version
    // can be legally reclaimed: meta_history shows RETAINED versions
    // only, and retention is a suffix — so either the newest flagged
    // version is retained (stamp must equal it), or every flagged
    // version is below the floor (stamp must be below the floor too).
    // A seed that never drew a REPLACE/cross-restore has NO stamp at
    // all — legal iff no retained version is flagged either.
    (stampedOpt, if (epochRow.isNullAt(0)) None else Some(epochRow.getLong(0))) match {
      case (None, None) => () // never swapped: nothing to check
      case (None, Some(f)) =>
        val p = dump("quiescence: flagged version but no stamp", Seq(s"flagged: $f"))
        assert(false,
          s"hunt $tbl: retained epoch-start $f but no stamp in _props (diag: $p)")
      case (Some(stamped), None) =>
        val floor = SnapshotStore.versions(spark, root).head
        if (stamped >= floor) {
          val p = dump("quiescence: no retained flagged but stamp in retention",
            Seq(s"stamped: $stamped", s"floor: $floor"))
          assert(false,
            s"hunt $tbl: no retained epoch-start yet stamp $stamped is at/above " +
              s"the retention floor $floor (diag: $p)")
        }
      case (Some(stamped), Some(f)) if stamped != f =>
        val p = dump("quiescence: stamp vs newest flagged", Seq(
          s"stamped: $stamped", s"newestEpoch: $f"))
        assert(false,
          s"hunt $tbl: stamp $stamped vs newest flagged $f (diag: $p)")
      case _ => ()
    }
    SnapshotStore.versions(spark, root).foreach { v =>
      val df = spark.sql(s"SELECT * FROM $catalog.ns.$tbl VERSION AS OF $v")
      if (df.columns.length != 2) {
        val p = dump(s"quiescence: version $v not two-column",
          Seq(s"columns: ${df.columns.toSeq}"))
        assert(false,
          s"hunt $tbl: version $v not a readable two-column frame " +
            s"(${df.columns.toSeq}) (diag: $p)")
      }
      assert(df.count() >= 0L)
    }
    if (fs.listStatus(new Path(root)).exists(
        _.getPath.getName.startsWith("_pending_contracts-"))) {
      val p = dump("quiescence: unconsumed bundles",
        fs.listStatus(new Path(root)).toSeq.map(_.getPath.getName))
      assert(false, s"hunt $tbl: unconsumed bundles (diag: $p)")
    }
  }
}
