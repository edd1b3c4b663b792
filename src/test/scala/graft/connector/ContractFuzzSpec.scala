package graft.connector

import java.nio.file.Files

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.store.SnapshotStore

/** Seeded fuzz over the contract-swap protocol: random sequences of
  * keyed upsert-inserts, merge-on-read DELETEs, schema-changing
  * REPLACEs, ALTER ADD COLUMN contract evolution, restores (same- and
  * cross-epoch), compactions, tags, WAP branch fork→write→publish
  * cycles, on-demand checkpoints, change-feed syncs of a DERIVED
  * mirror table (incremental keyed diff within an epoch, the atomic
  * full-refresh door across REPLACE/cross-epoch-restore boundaries —
  * checked against the source's exact content after every sync), and
  * INJECTED CRASHES (the swap hook throws after the manifest commit,
  * before the contract swap — the exact window the write-ahead bundles
  * heal).
  *
  * The model tracks EPOCH INSTANCES — one column list per contract
  * epoch, where the LIVE instance grows via ALTER (contract evolution
  * is version-less: every version of an instance reads under the
  * instance's FINAL columns — the list archived by the ending REPLACE
  * for frozen instances, the live `_schema` for the current one; a
  * cross-epoch restore REVIVES a frozen instance as a new live copy) —
  * and, per committed version, the exact row content (key → column →
  * value; keyed inserts are latest-wins merges, deletes are removals,
  * columns a row predates read back null). After a final clean REPLACE
  * forces quiescence (healing any outstanding crash) and a vacuum
  * prunes history under tag-stretched retention, EVERY retained
  * version must time-travel to its instance's columns and its
  * model-predicted rows through BOTH doors (VERSION AS OF and its
  * manifest-recorded commit timestamp), every tag must read its pinned
  * version's content by name, the epoch stamp must sit at the last
  * contract swap, and no pending bundle may remain. One wrong archive,
  * one missed heal, one clobbered live file, one dropped, duplicated,
  * or mis-filled row anywhere in the interleave fails the sweep.
  */
class ContractFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-cfuzz").toString
  spark.conf.set("spark.sql.catalog.gfz", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gfz.root", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gfz.ns")

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def runSeed(seed: Int): Unit = {
    val tbl = s"t$seed"
    val dir = s"$warehouse/ns/$tbl"
    val rnd = new scala.util.Random(seed)
    spark.sql(s"""CREATE TABLE gfz.ns.$tbl (k BIGINT, v BIGINT) USING graft
                  TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql(s"INSERT INTO gfz.ns.$tbl VALUES (1, 0)")
    def head: Long = SnapshotStore.latestVersion(spark, dir).get

    // ---- the model -------------------------------------------------
    // epoch instances: column list per epoch; only the live one grows
    val instCols = mutable.ArrayBuffer(mutable.ArrayBuffer("k", "v"))
    var liveInst = 0
    val instOf = mutable.Map[Long, Int]()
    // content per version: key → (colName → value-as-string); columns
    // a row never carried are absent and must read back as null
    val rows = mutable.Map[Long, Map[String, Map[String, String]]]()
    var curRows = Map("1" -> Map("v" -> "0"))
    def curCols: Seq[String] = instCols(liveInst).toSeq
    def numericKey: Boolean = curCols.head == "k"
    def snap(): Unit = { instOf(head) = liveInst; rows(head) = curRows }
    instOf(0L) = 0; rows(0L) = Map.empty // the CREATE commit
    snap()
    val tags = mutable.ArrayBuffer.empty[(String, Long)]
    // at most one zero-copy clone per seed: (root, fork cols, fork rows)
    var clone: Option[(String, Seq[String], Map[String, Map[String, String]])] =
      None
    var epoch = 0
    var tagN = 0
    var addN = 0
    var addsLeft = 2
    var crashesLeft = 2
    var torn = false // a crashed swap is outstanding (unhealed)
    // a torn table reads/writes under stale contracts (the documented
    // crash window) — non-contract ops heal first, the way an operator
    // would: ANY contract op rolls the swap forward
    def heal(): Unit = if (torn) {
      spark.sql(s"ALTER TABLE gfz.ns.$tbl SET TBLPROPERTIES ('fz'='1')")
      torn = false
    }
    def randKey(): String =
      if (numericKey) rnd.nextInt(50).toString else s"r${rnd.nextInt(50)}"
    def sqlKey(key: String): String = if (numericKey) key else s"'$key'"

    // a DERIVED table maintained through the change feed across the
    // whole interleave: incremental keyed sync within an epoch, the
    // atomic full-refresh door across REPLACE/cross-epoch-restore
    // boundaries. After every sync it must mirror the source exactly.
    val dRoot = s"$warehouse/ns/derived_$tbl"
    def syncAndCheckDerived(): Unit = {
      graft.store.ChangeFeed.syncDerived(spark, dir, dRoot, s"fz$seed",
        keys = Seq(curCols.head), numBuckets = 4): Unit
      val df = SnapshotStore.read(spark, dRoot)
      val gotCols = df.columns.toSeq
      // a mirror bootstrapped from an EMPTY source is a path table
      // with no schema anywhere (no data files, no _schema breadcrumb)
      // — zero columns is correct exactly when the source is empty
      if (gotCols.isEmpty) {
        assert(curRows.isEmpty,
          s"seed $seed: schema-less empty mirror but source has $curRows")
      } else {
        // columns only appear in the target once some synced file
        // carries them (an ALTER-declared column no row ever valued may
        // lag), and they reset at each full refresh — but never exceed
        // the source's
        assert(gotCols.toSet.subsetOf(curCols.toSet) &&
          gotCols.head == curCols.head,
          s"seed $seed: derived columns $gotCols must be a prefix-keyed " +
            s"subset of source columns $curCols")
        val got = df.collect().map { r =>
          String.valueOf(r.get(0)) -> gotCols.tail.zipWithIndex.map {
            case (c, j) => c -> String.valueOf(r.get(j + 1)) }.toMap
        }.toMap
        assert(got.keySet == curRows.keySet,
          s"seed $seed: derived key set ${got.keySet} must equal the " +
            s"source's ${curRows.keySet}")
        got.foreach { case (k, m) =>
          m.foreach { case (c, value) =>
            val exp = curRows(k).getOrElse(c, "null")
            assert(value == exp,
              s"seed $seed: derived $k.$c = $value, source has $exp")
          }
        }
      }
    }

    System.setProperty("graft.snapshot.contractSwapGraceMs", "100")
    try {
      (1 to 20).foreach { i =>
        rnd.nextInt(13) match {
          case 0 | 1 => // full-row keyed insert (latest-wins on the key)
            heal()
            val key = randKey()
            val vals = curCols.tail.map(_ => rnd.nextInt(100))
            spark.sql(s"INSERT INTO gfz.ns.$tbl (${curCols.mkString(", ")}) " +
              s"VALUES (${sqlKey(key)}${vals.map(v => s", $v").mkString})")
            curRows = curRows.updated(key,
              curCols.tail.zip(vals.map(_.toString)).toMap)
            snap()
          case 2 | 3 => // REPLACE to a fresh schema, maybe crashing mid-swap
            epoch += 1
            val c = s"c$epoch"
            val crash = crashesLeft > 0 && rnd.nextInt(3) == 0
            if (crash) {
              crashesLeft -= 1
              val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
              SnapshotStore.replaceSwapHook = (root, _) =>
                if (root.endsWith(s"/ns/$tbl") &&
                    fired.compareAndSet(false, true))
                  throw new RuntimeException("fuzz crash")
            }
            try {
              try spark.sql(
                s"""REPLACE TABLE gfz.ns.$tbl TBLPROPERTIES ('keys'='$c') AS
                   |SELECT 'x' AS $c, CAST(1 AS BIGINT) AS n""".stripMargin)
              catch { case e: Exception if crash &&
                  e.toString.contains("fuzz crash") ||
                  e.getCause != null &&
                  e.getCause.toString.contains("fuzz crash") => }
            } finally SnapshotStore.replaceSwapHook = (_, _) => ()
            torn = crash // a clean REPLACE also HEALS any prior crash
            // committed either way; heal restores the contract swap.
            // The displaced instance FREEZES at its current columns.
            instCols += mutable.ArrayBuffer(c, "n")
            liveInst = instCols.size - 1
            curRows = Map("x" -> Map("n" -> "1"))
            snap()
          case 4 => // restore to a random retained version (any epoch)
            val vs = SnapshotStore.versions(spark, dir)
            val target = vs(rnd.nextInt(vs.length))
            if (target != head) {
              SnapshotStore.restore(spark, dir, target)
              torn = false // restore awaited quiescence (healing) first
              val ti = instOf(target)
              if (ti != liveInst) {
                // cross-epoch: the frozen instance REVIVES as a new
                // live copy (its archive stays in place — r13 ADVICE)
                instCols += instCols(ti).clone()
                liveInst = instCols.size - 1
              }
              curRows = rows(target)
              snap()
            }
          case 5 => // merge-on-read DELETE of one key (hit or miss)
            heal()
            val key =
              if (curRows.nonEmpty && rnd.nextBoolean())
                curRows.keys.toSeq.sorted.apply(rnd.nextInt(curRows.size))
              else randKey()
            spark.sql(s"DELETE FROM gfz.ns.$tbl WHERE ${curCols.head} = " +
              sqlKey(key))
            curRows = curRows - key
            snap()
          case 6 => // compact: folds tombstones, content-preserving
            heal()
            SnapshotStore.compact(spark, dir)
            snap()
          case 7 => // tag the head (pins it — and, with it, retention)
            heal()
            tagN += 1
            val name = s"tg${seed}n$tagN"
            SnapshotStore.createTag(spark, dir, name)
            tags += ((name, head))
          case 8 => // WAP: fork a branch, write one row on it, publish
            heal()
            val bn = s"b${seed}n$i"
            SnapshotStore.createBranch(spark, dir, bn)
            val br = SnapshotStore.branchRoot(dir, bn)
            val key = randKey()
            val vals = curCols.tail.map(_ => rnd.nextInt(100))
            val keyVal: Any = if (numericKey) key.toLong else key
            val schema = StructType(
              StructField(curCols.head,
                if (numericKey) LongType else StringType) +:
              curCols.tail.map(c => StructField(c, LongType)))
            val delta = spark.createDataFrame(
              java.util.List.of(Row.fromSeq(keyVal +: vals.map(_.toLong))),
              schema)
            SnapshotStore.commitDelta(spark, br, delta, Seq(curCols.head),
              SnapshotStore.upsertMerge(Seq(curCols.head)))
            SnapshotStore.publishBranch(spark, dir, bn)
            curRows = curRows.updated(key,
              curCols.tail.zip(vals.map(_.toString)).toMap)
            snap() // the publish commit is a new version on main
          case 9 => // on-demand checkpoint: metadata only, no version
            heal()
            SnapshotStore.checkpoint(spark, dir): Unit
          case 10 => // ALTER ADD COLUMN: version-less contract evolution
            if (addsLeft > 0) {
              addsLeft -= 1
              addN += 1
              // ALTER serializes behind (and heals) pending swaps
              spark.sql(s"ALTER TABLE gfz.ns.$tbl ADD COLUMN w$addN BIGINT")
              torn = false
              // the LIVE instance widens — retroactively for every
              // version it governs (history null-fills, no rewrite)
              instCols(liveInst) += s"w$addN"
            }
          case 11 => // change-feed sync of the derived mirror + check
            heal()
            syncAndCheckDerived()
          case 12 => // zero-copy clone: freezes fork-time columns+content
            if (clone.isEmpty) {
              heal()
              val cRoot = s"$warehouse/ns/clone_$tbl"
              SnapshotStore.cloneTable(spark, dir, cRoot): Unit
              clone = Some((cRoot, curCols, curRows))
            }
        }
      }
      // final clean REPLACE: heals any outstanding crashed swap, then
      // installs a known terminal epoch
      epoch += 1
      spark.sql(s"""REPLACE TABLE gfz.ns.$tbl TBLPROPERTIES ('keys'='zz') AS
                    SELECT 'end' AS zz, CAST(1 AS BIGINT) AS n""")
      instCols += mutable.ArrayBuffer("zz", "n")
      liveInst = instCols.size - 1
      curRows = Map("end" -> Map("n" -> "1"))
      snap()
      // the final sync ALWAYS crosses a keys-changing REPLACE — the
      // full-refresh door runs deterministically every seed
      syncAndCheckDerived()
      // vacuum under tag-stretched retention: keeps the suffix from
      // the oldest tag (or last 3) and auto-checkpoints the floor
      val replaceHead = head
      SnapshotStore.vacuum(spark, dir, keepLast = 3): Unit
      // a floor-advancing vacuum publishes an EMPTY serialization
      // commit — model it (same instance, same content as its base)
      if (head != replaceHead) snap()
    } finally System.clearProperty("graft.snapshot.contractSwapGraceMs")

    // ---- invariant sweep ------------------------------------------
    // the stamp sits at the final REPLACE; the head may be the vacuum's
    // plain serialization commit above it
    val stamped = SnapshotStore.readProps(spark, dir)("graft.schema.epoch").toLong
    assert(SnapshotStore.isEpochStart(spark, dir, stamped) &&
      (stamped to head).drop(1).forall(v => !SnapshotStore.isEpochStart(spark, dir, v)),
      s"seed $seed: epoch stamp must sit at the final REPLACE")
    assert(spark.table(s"gfz.ns.$tbl").columns.toSeq == Seq("zz", "n"))
    // expected state of version v: its instance's FINAL columns;
    // stored cells, with never-carried columns null-filled
    def expect(v: Long): (Seq[String], Map[String, Map[String, String]]) = {
      val cs = instCols(instOf(v)).toSeq
      (cs, rows(v).map { case (k, m) =>
        k -> cs.tail.map(c => c -> m.getOrElse(c, "null")).toMap })
    }
    def contentOf(df: DataFrame, cs: Seq[String])
        : Map[String, Map[String, String]] =
      df.collect().map { r =>
        String.valueOf(r.get(0)) -> cs.tail.zipWithIndex.map { case (c, j) =>
          c -> String.valueOf(r.get(j + 1)) }.toMap
      }.toMap
    val retained = SnapshotStore.versions(spark, dir)
    retained.foreach { v =>
      val (cs, exp) = expect(v)
      val byV = spark.sql(s"SELECT * FROM gfz.ns.$tbl VERSION AS OF $v")
      assert(byV.columns.toSeq == cs,
        s"seed $seed: version $v must read under its own instance's " +
          s"columns $cs, got ${byV.columns.toSeq}")
      val content = contentOf(byV, cs)
      assert(content == exp,
        s"seed $seed: version $v content drifted from the model: " +
          s"expected $exp, got $content")
      // the TIMESTAMP door must resolve to the same pin: commit
      // timestamps are manifest-recorded and strictly increasing, so
      // v's own timestamp names exactly v
      val ts = SnapshotStore.commitTimeMillis(spark, dir, v)
      val byTs = spark.read.format("graft")
        .option("timestampAsOf", ts.toString).load(dir)
      assert(contentOf(byTs, cs) == exp,
        s"seed $seed: TIMESTAMP AS OF v$v's commit ts must read v$v")
    }
    tags.foreach { case (name, v) =>
      assert(retained.contains(v),
        s"seed $seed: tag $name pins version $v — vacuum must retain it")
      val (cs, exp) = expect(v)
      val byTag = spark.sql(s"SELECT * FROM gfz.ns.$tbl VERSION AS OF '$name'")
      assert(contentOf(byTag, cs) == exp,
        s"seed $seed: tag $name must read version $v's content")
    }
    // the zero-copy clone froze at fork time: it must still read its
    // fork-time columns and content — through the source's later
    // REPLACEs, ALTERs, restores, and the closing vacuum (clone
    // retention pins the absolute dirs it references)
    clone.foreach { case (_, cCols, cRows) =>
      val df = spark.table(s"gfz.ns.clone_$tbl")
      assert(df.columns.toSeq == cCols,
        s"seed $seed: clone must keep its fork-time columns $cCols, " +
          s"got ${df.columns.toSeq}")
      val exp = cRows.map { case (k, m) =>
        k -> cCols.tail.map(c => c -> m.getOrElse(c, "null")).toMap }
      val got = contentOf(df, cCols)
      assert(got == exp,
        s"seed $seed: clone content drifted: expected $exp, got $got")
    }
    assert(!fs.listStatus(new Path(s"$warehouse/ns/$tbl")).exists(
      _.getPath.getName.startsWith("_pending_contracts-")),
      s"seed $seed: all write-ahead bundles must be consumed")
  }

  // resident seeds run every suite; rounds sweep FRESH ranges with
  // e.g. `set Test/javaOptions += "-Dgraft.fuzz.seeds=17-26"` —
  // r13 swept 7-16, r14 swept 17-26 (both green)
  private val extraSeeds: Seq[Int] = sys.props.get("graft.fuzz.seeds")
    .toSeq.flatMap(_.split(",").toSeq.flatMap { tok =>
      tok.trim.split("-") match {
        case Array(a, b) => a.trim.toInt to b.trim.toInt
        case Array(a) if a.trim.nonEmpty => Seq(a.trim.toInt)
        case _ => Seq.empty
      }
    })

  (Seq(1, 2, 3, 4, 5, 6) ++ extraSeeds).distinct.foreach { seed =>
    test(s"seeded op/crash interleave keeps every version contract-coherent (seed $seed)") {
      runSeed(seed)
    }
  }
}
