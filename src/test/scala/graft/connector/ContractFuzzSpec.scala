package graft.connector

import java.nio.file.Files

import scala.collection.mutable

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.store.SnapshotStore

/** Seeded fuzz over the contract-swap protocol: random sequences of
  * keyed inserts, schema-changing REPLACEs, restores (same- and
  * cross-epoch), and INJECTED CRASHES (the swap hook throws after the
  * manifest commit, before the contract swap — the exact window the
  * write-ahead bundles heal). The model tracks, per committed version,
  * the column set that epoch's schema declares; after a final clean
  * REPLACE forces quiescence (healing any outstanding crash), EVERY
  * retained version must time-travel under its model-predicted
  * columns, the epoch stamp must sit at the last contract swap, and no
  * pending bundle may remain. One wrong archive, one missed heal, one
  * clobbered live file anywhere in the interleave fails the sweep.
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
    // model: columns declared by the epoch governing each version
    val cols = mutable.Map[Long, Seq[String]]()
    def head: Long = SnapshotStore.latestVersion(spark, dir).get
    cols(0L) = Seq("k", "v"); cols(head) = Seq("k", "v")
    var epoch = 0
    var crashesLeft = 2
    var torn = false // a crashed swap is outstanding (unhealed)
    System.setProperty("graft.snapshot.contractSwapGraceMs", "100")
    try {
      (1 to 14).foreach { _ =>
        val curCols = cols(head)
        rnd.nextInt(4) match {
          case 0 => // keyed insert under the current epoch's first column
            if (torn) {
              // a torn table reads/writes under stale contracts (the
              // documented crash window) — heal first, the way an
              // operator would: ANY contract op rolls the swap forward
              spark.sql(
                s"ALTER TABLE gfz.ns.$tbl SET TBLPROPERTIES ('fz'='1')")
              torn = false
            }
            val key = curCols.head
            val other = curCols(1)
            spark.sql(s"INSERT INTO gfz.ns.$tbl ($key, $other) VALUES " +
              (if (curCols == Seq("k", "v")) s"(${rnd.nextInt(50)}, 1)"
               else s"('r${rnd.nextInt(50)}', 1)"))
            cols(head) = curCols
          case 1 | 2 => // REPLACE to a fresh schema, maybe crashing mid-swap
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
            cols(head) = Seq(c, "n") // committed either way; heal restores this
          case 3 => // restore to a random retained version (any epoch)
            val vs = SnapshotStore.versions(spark, dir)
            val target = vs(rnd.nextInt(vs.length))
            if (target != head) {
              SnapshotStore.restore(spark, dir, target)
              torn = false // restore awaited quiescence (healing) first
              cols(head) = cols(target)
            }
        }
      }
      // final clean REPLACE: heals any outstanding crashed swap, then
      // installs a known terminal epoch
      epoch += 1
      spark.sql(s"""REPLACE TABLE gfz.ns.$tbl TBLPROPERTIES ('keys'='zz') AS
                    SELECT 'end' AS zz, CAST(1 AS BIGINT) AS n""")
      cols(head) = Seq("zz", "n")
    } finally System.clearProperty("graft.snapshot.contractSwapGraceMs")

    // ---- invariant sweep ------------------------------------------
    val finalHead = head
    assert(SnapshotStore.readProps(spark, dir)("graft.schema.epoch").toLong
      == finalHead, s"seed $seed: epoch stamp must sit at the final REPLACE")
    assert(spark.table(s"gfz.ns.$tbl").columns.toSeq == Seq("zz", "n"))
    SnapshotStore.versions(spark, dir).foreach { v =>
      val got = spark.sql(s"SELECT * FROM gfz.ns.$tbl VERSION AS OF $v")
        .columns.toSeq
      assert(got == cols(v),
        s"seed $seed: version $v must read under its own epoch's " +
          s"columns ${cols(v)}, got $got")
    }
    assert(!fs.listStatus(new Path(s"$warehouse/ns/$tbl")).exists(
      _.getPath.getName.startsWith("_pending_contracts-")),
      s"seed $seed: all write-ahead bundles must be consumed")
  }

  Seq(1, 2, 3).foreach { seed =>
    test(s"seeded op/crash interleave keeps every version contract-coherent (seed $seed)") {
      runSeed(seed)
    }
  }
}
