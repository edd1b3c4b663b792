package graft.connector

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._


import graft.SparkSpec
import graft.store.SnapshotStore

/** Contract-op chaos: four seeded rounds of four threads racing random
  * streams of inserts, MoR deletes, schema-changing REPLACEs, restores,
  * compactions, tags, checkpoints, and WAP branch fork→write→publish
  * cycles on one catalog table — the
  * suite-resident twin of the soak's §3g (thread interleaves are real,
  * so outcomes vary run to run; the INVARIANTS may not). Documented
  * conflicts only (concurrent-modification, stale-plan
  * analysis/cast errors); after quiescence the epoch stamp sits at the
  * newest flagged version, every retained version time-travels to a
  * readable two-column frame (a three-column read = a cross-epoch
  * union leaked), and every write-ahead bundle is consumed. This hunt
  * found, in one session: the lost-generation commit hole, the
  * rebase-across-epoch manifest mixing, the concurrent same-version
  * checkpoint clobber, the checksummed small-file rename tear, and the
  * restore-re-instated stale-shape window — each now guarded and
  * separately spec-pinned.
  */
class ChaosHuntSpec extends SparkSpec {

  private val warehouse = Files.createTempDirectory("graft-chaoshunt").toString
  spark.conf.set("spark.sql.catalog.gch", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gch.root", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gch.ns")

  (1 to 4).foreach { round =>
    test(s"contract-op chaos hunt round $round (4 threads x 10 ops)") {
      ChaosOps.hunt(spark, "gch", warehouse, s"h$round", seed = round,
        nThreads = 4, opsPer = 10, info = info(_)): Unit
    }
  }

  test("contract-op chaos hunt, dml.mode=delta personality (4 threads x 10 ops)") {
    // the delta row-ID path (w07's surface) under the same op mix:
    // O(changed-rows) staging, runtime-filter narrowing and tombstone
    // DELETEs racing vacuum / REPLACE / rebucket / restore
    ChaosOps.hunt(spark, "gch", warehouse, "hd", seed = 5,
      nThreads = 4, opsPer = 10, info = info(_), dmlMode = "delta"): Unit
  }

  test("syncDerived converges under concurrent source chaos") {
    // two mutator threads churn the source (inserts, deletes,
    // REPLACEs, restores) while a third runs incremental change-feed
    // syncs the whole time — any sync may hit a documented conflict or
    // boundary refusal, but after quiescence ONE final sync must leave
    // the mirror exactly equal to the source, column for column
    val tbl = "sy"
    val root = s"$warehouse/ns/$tbl"
    val dRoot = s"$warehouse/ns/sy_mirror"
    spark.sql(s"""CREATE TABLE gch.ns.$tbl (k BIGINT, v BIGINT) USING graft
                  TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql(s"INSERT INTO gch.ns.$tbl SELECT id, id * 2 FROM range(0, 30)")
    def srcKeys(): Seq[String] = SnapshotStore.readManifest(spark, root,
      SnapshotStore.latestVersion(spark, root).get).keys
    def documentedSync(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(6).exists { x =>
        x.isInstanceOf[java.util.ConcurrentModificationException] ||
          (x.getMessage != null &&
            (x.getMessage.contains("REPLACE") ||
             x.getMessage.contains("refuses") ||
             x.getMessage.contains("not in") || // restored past a version
             x.getMessage.contains("cannot be resolved")))
      }
    val epochN = new java.util.concurrent.atomic.AtomicInteger(100)
    val gate = new CountDownLatch(1)
    // self-diagnosing (r14 flake-ledger lesson): every op and outcome
    // is journaled, and any failure — undocumented mid-chaos throw or
    // final divergence — persists the journal + both states via
    // ChaosOps.dumpDiagnostics before the assert fires
    val opsLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def dump(reason: String, extra: Seq[String]): String =
      ChaosOps.dumpDiagnostics("syncderived",
        s"reason: $reason" +:
          s"versions: ${scala.util.Try(SnapshotStore.versions(spark, root)).toOption}" +:
          (opsLog.toArray(Array.empty[String]).toSeq.map("op: " + _) ++ extra))
    val muts = (0 until 2).map { t =>
      Future {
        gate.await()
        val rnd = new scala.util.Random(7000 + t)
        (1 to 8).foreach { i =>
          val op = rnd.nextInt(5)
          opsLog.add(s"mut$t#$i op$op begin"): Unit
          try {
            op match {
              case 0 | 1 =>
                val cols = spark.table(s"gch.ns.$tbl").columns
                val key =
                  if (cols.head == "k") rnd.nextInt(40).toString
                  else s"'x${rnd.nextInt(40)}'"
                spark.sql(s"INSERT INTO gch.ns.$tbl (${cols.mkString(", ")}) " +
                  s"VALUES ($key, ${rnd.nextInt(100)})")
              case 2 =>
                val cols = spark.table(s"gch.ns.$tbl").columns
                spark.sql(s"DELETE FROM gch.ns.$tbl WHERE ${cols.head} = " +
                  (if (cols.head == "k") rnd.nextInt(40).toString
                   else s"'x${rnd.nextInt(40)}'"))
              case 3 =>
                val c = s"e${epochN.incrementAndGet()}s$t"
                spark.sql(s"""REPLACE TABLE gch.ns.$tbl
                  TBLPROPERTIES ('keys'='$c')
                  AS SELECT 'r' AS $c, CAST(1 AS BIGINT) AS n""")
              case 4 =>
                val vs = SnapshotStore.versions(spark, root)
                val target = vs(rnd.nextInt(vs.length))
                opsLog.add(s"mut$t#$i restore -> $target"): Unit
                SnapshotStore.restore(spark, root, target): Unit
            }
            opsLog.add(s"mut$t#$i op$op landed"): Unit
          } catch {
            case e: Throwable if ChaosOps.documented(e) =>
              opsLog.add(s"mut$t#$i op$op documented conflict: " +
                s"${e.getClass.getSimpleName}: ${e.getMessage}"): Unit
            case e: Throwable =>
              val p = dump(s"mutator $t op$op UNDOCUMENTED",
                ChaosOps.renderChain(e))
              throw new IllegalStateException(
                s"sync-chaos mutator $t UNDOCUMENTED failure (diag: $p)", e)
          }
        }
      }
    }
    val syncer = Future {
      gate.await()
      (1 to 10).foreach { i =>
        try {
          graft.store.ChangeFeed.syncDerived(spark, root, dRoot, "cs",
            keys = srcKeys(), numBuckets = 4): Unit
          opsLog.add(s"sync#$i landed"): Unit
        } catch {
          case e: Throwable if documentedSync(e) =>
            opsLog.add(s"sync#$i documented conflict: " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}"): Unit
          case e: Throwable =>
            val p = dump(s"syncer#$i UNDOCUMENTED", ChaosOps.renderChain(e))
            throw new IllegalStateException(
              s"sync-chaos syncer UNDOCUMENTED failure (diag: $p)", e)
        }
        Thread.sleep(30)
      }
    }
    gate.countDown()
    Await.result(Future.sequence(muts :+ syncer), 1800.seconds)
    // quiescence, then one clean final sync must converge exactly
    graft.store.ChangeFeed.syncDerived(spark, root, dRoot, "cs",
      keys = srcKeys(), numBuckets = 4): Unit
    def byName(df: org.apache.spark.sql.DataFrame)
        : Set[Map[String, String]] = {
      val cols = df.columns
      df.collect().map(r => cols.zipWithIndex.map { case (c, i) =>
        c -> String.valueOf(r.get(i)) }.toMap).toSet
    }
    val src = byName(spark.table(s"gch.ns.$tbl").toDF())
    val mir = byName(SnapshotStore.read(spark, dRoot))
    if (mir != src) {
      val p = dump("final divergence",
        Seq(s"source-only: ${src -- mir}", s"mirror-only: ${mir -- src}",
          s"source: $src", s"mirror: $mir"))
      fail(s"mirror diverged after quiescent sync (diag: $p): " +
        s"source-only ${src -- mir}, mirror-only ${mir -- src}")
    }
  }
}
