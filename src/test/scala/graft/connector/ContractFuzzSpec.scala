package graft.connector

import java.nio.file.Files

import scala.collection.mutable

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.store.SnapshotStore

/** Seeded fuzz over the contract-swap protocol: random sequences of
  * keyed upsert-inserts, merge-on-read DELETEs, schema-changing
  * REPLACEs, restores (same- and cross-epoch), compactions, tags,
  * WAP branch fork→write→publish cycles, on-demand checkpoints, and
  * INJECTED CRASHES (the swap hook throws after the manifest commit,
  * before the contract swap — the exact window the write-ahead bundles
  * heal). The model tracks, per committed version, both the column set
  * that epoch's schema declares AND the exact row content (a key→value
  * map — keyed inserts are latest-wins merges, deletes are removals);
  * after a final clean REPLACE forces quiescence (healing any
  * outstanding crash) and a vacuum prunes history under tag-stretched
  * retention, EVERY retained version must time-travel to its
  * model-predicted columns and rows through BOTH doors (VERSION AS OF
  * and its manifest-recorded commit timestamp), every tag must read
  * its pinned version's content by name, the epoch stamp must sit at
  * the last contract swap, and no pending bundle may remain. One wrong
  * archive, one missed heal, one clobbered live file, one dropped or
  * duplicated row anywhere in the interleave fails the sweep.
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
    // model: per committed version, the epoch's declared columns and
    // the exact content (key → value, both as strings)
    val cols = mutable.Map[Long, Seq[String]]()
    val rows = mutable.Map[Long, Map[String, String]]()
    var curCols = Seq("k", "v")
    var curRows = Map("1" -> "0")
    def snap(): Unit = { cols(head) = curCols; rows(head) = curRows }
    cols(0L) = curCols; rows(0L) = Map.empty // the CREATE commit
    snap()
    val tags = mutable.ArrayBuffer.empty[(String, Long)]
    var epoch = 0
    var tagN = 0
    var crashesLeft = 2
    var torn = false // a crashed swap is outstanding (unhealed)
    // a torn table reads/writes under stale contracts (the documented
    // crash window) — non-contract ops heal first, the way an operator
    // would: ANY contract op rolls the swap forward
    def heal(): Unit = if (torn) {
      spark.sql(s"ALTER TABLE gfz.ns.$tbl SET TBLPROPERTIES ('fz'='1')")
      torn = false
    }
    def numericEpoch: Boolean = curCols == Seq("k", "v")
    System.setProperty("graft.snapshot.contractSwapGraceMs", "100")
    try {
      (1 to 20).foreach { i =>
        rnd.nextInt(10) match {
          case 0 | 1 => // keyed insert (latest-wins merge on the key)
            heal()
            val value = rnd.nextInt(100)
            val key =
              if (numericEpoch) rnd.nextInt(50).toString else s"r${rnd.nextInt(50)}"
            spark.sql(s"INSERT INTO gfz.ns.$tbl (${curCols.head}, " +
              s"${curCols(1)}) VALUES " +
              (if (numericEpoch) s"($key, $value)" else s"('$key', $value)"))
            curRows = curRows.updated(key, value.toString)
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
            curCols = Seq(c, "n") // committed either way; heal restores this
            curRows = Map("x" -> "1")
            snap()
          case 4 => // restore to a random retained version (any epoch)
            val vs = SnapshotStore.versions(spark, dir)
            val target = vs(rnd.nextInt(vs.length))
            if (target != head) {
              SnapshotStore.restore(spark, dir, target)
              torn = false // restore awaited quiescence (healing) first
              curCols = cols(target); curRows = rows(target)
              snap()
            }
          case 5 => // merge-on-read DELETE of one key (hit or miss)
            heal()
            val key =
              if (curRows.nonEmpty && rnd.nextBoolean())
                curRows.keys.toSeq.sorted.apply(rnd.nextInt(curRows.size))
              else if (numericEpoch) rnd.nextInt(50).toString
              else s"r${rnd.nextInt(50)}"
            spark.sql(s"DELETE FROM gfz.ns.$tbl WHERE ${curCols.head} = " +
              (if (numericEpoch) key else s"'$key'"))
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
            val value = rnd.nextInt(100)
            val delta =
              if (numericEpoch) {
                val key = rnd.nextInt(50)
                curRows = curRows.updated(key.toString, value.toString)
                Seq((key.toLong, value.toLong)).toDF(curCols: _*)
              } else {
                val key = s"r${rnd.nextInt(50)}"
                curRows = curRows.updated(key, value.toString)
                Seq((key, value.toLong)).toDF(curCols: _*)
              }
            SnapshotStore.commitDelta(spark, br, delta, Seq(curCols.head),
              SnapshotStore.upsertMerge(Seq(curCols.head)))
            SnapshotStore.publishBranch(spark, dir, bn)
            snap() // the publish commit is a new version on main
          case 9 => // on-demand checkpoint: metadata only, no version
            heal()
            SnapshotStore.checkpoint(spark, dir): Unit
        }
      }
      // final clean REPLACE: heals any outstanding crashed swap, then
      // installs a known terminal epoch
      epoch += 1
      spark.sql(s"""REPLACE TABLE gfz.ns.$tbl TBLPROPERTIES ('keys'='zz') AS
                    SELECT 'end' AS zz, CAST(1 AS BIGINT) AS n""")
      curCols = Seq("zz", "n"); curRows = Map("end" -> "1")
      snap()
      // vacuum under tag-stretched retention: keeps the suffix from
      // the oldest tag (or last 3) and auto-checkpoints the floor
      SnapshotStore.vacuum(spark, dir, keepLast = 3): Unit
    } finally System.clearProperty("graft.snapshot.contractSwapGraceMs")

    // ---- invariant sweep ------------------------------------------
    val finalHead = head
    assert(SnapshotStore.readProps(spark, dir)("graft.schema.epoch").toLong
      == finalHead, s"seed $seed: epoch stamp must sit at the final REPLACE")
    assert(spark.table(s"gfz.ns.$tbl").columns.toSeq == Seq("zz", "n"))
    def contentOf(sql: String): Map[String, String] =
      spark.sql(sql).collect()
        .map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1)))).toMap
    val retained = SnapshotStore.versions(spark, dir)
    retained.foreach { v =>
      val got = spark.sql(s"SELECT * FROM gfz.ns.$tbl VERSION AS OF $v")
        .columns.toSeq
      assert(got == cols(v),
        s"seed $seed: version $v must read under its own epoch's " +
          s"columns ${cols(v)}, got $got")
      val content = contentOf(s"SELECT * FROM gfz.ns.$tbl VERSION AS OF $v")
      assert(content == rows(v),
        s"seed $seed: version $v content drifted from the model: " +
          s"expected ${rows(v)}, got $content")
      // the TIMESTAMP door must resolve to the same pin: commit
      // timestamps are manifest-recorded and strictly increasing, so
      // v's own timestamp names exactly v
      val ts = SnapshotStore.commitTimeMillis(spark, dir, v)
      val byTs = spark.read.format("graft")
        .option("timestampAsOf", ts.toString).load(dir).collect()
        .map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1)))).toMap
      assert(byTs == rows(v),
        s"seed $seed: TIMESTAMP AS OF v$v's commit ts must read v$v: " +
          s"expected ${rows(v)}, got $byTs")
    }
    tags.foreach { case (name, v) =>
      assert(retained.contains(v),
        s"seed $seed: tag $name pins version $v — vacuum must retain it")
      val content = contentOf(s"SELECT * FROM gfz.ns.$tbl VERSION AS OF '$name'")
      assert(content == rows(v),
        s"seed $seed: tag $name must read version $v's content")
    }
    assert(!fs.listStatus(new Path(s"$warehouse/ns/$tbl")).exists(
      _.getPath.getName.startsWith("_pending_contracts-")),
      s"seed $seed: all write-ahead bundles must be consumed")
  }

  Seq(1, 2, 3, 4).foreach { seed =>
    test(s"seeded op/crash interleave keeps every version contract-coherent (seed $seed)") {
      runSeed(seed)
    }
  }
}
