package graft.connector

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.store.{ChangeFeed, ObjectStoreSim, SnapshotStore}

/** Chaos-hunts the STREAMING change-feed source (the V1
  * `readStream.format("graft")` path: offset protocol,
  * `maxVersionsPerBatch` pacing, `consumerId` retention,
  * `replaceBoundary=refresh` recovery) — the one r13/r14 brief item
  * deterministic specs could not close. A paced, rate-limited consumer
  * repeatedly drains the feed WHILE mutator threads churn the source
  * with inserts, predicate deletes, keys-changing REPLACEs, restores,
  * compactions, checkpoints, and vacuums; after quiescence one final
  * drain must leave the consumer's merge-applied mirror EXACTLY equal
  * to the source, key for key — on the POSIX filesystem AND on the
  * object-store double (`osim://`, conditional-PUT personality).
  *
  * Design notes:
  *  - every mutator epoch keeps the consumer's identity column `k`
  *    (the syncDerived contract the batch twin in ChaosHuntSpec uses)
  *    and keeps `k` unique state-wide (the epoch key is an injective
  *    function of `k`), so mirror convergence is well-defined across
  *    any interleaving of REPLACEs and restores;
  *  - vacuum runs in the mix on purpose: the registered `consumerId`
  *    floor must keep every version an uncommitted batch still needs
  *    (an unconstructible diff here = the retention protocol broke);
  *  - self-diagnosing per the r14 flake-ledger lesson: every op and
  *    every batch is journaled, and any failure persists the journal +
  *    both end states via [[ChaosOps.dumpDiagnostics]].
  */
class StreamChaosSpec extends SparkSpec {
  import spark.implicits._

  locally {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.osim.impl", classOf[ObjectStoreSim].getName)
  }

  /** One full chaos round against `catalog` rooted at `warehouse`. */
  private def chaosRound(catalog: String, warehouse: String, tbl: String,
                         seed: Int): Unit = {
    val root = s"$warehouse/ns/$tbl"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $catalog.ns")
    spark.sql(s"""CREATE TABLE $catalog.ns.$tbl (k BIGINT, v BIGINT) USING graft
                  TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql(s"INSERT INTO $catalog.ns.$tbl SELECT id, id * 2 FROM range(0, 30)")

    val opsLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val mirror = scala.collection.mutable.Map.empty[Long, Long]
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ckpt = Files.createTempDirectory(s"graft-streamchaos-$tbl").toString

    def dump(reason: String, extra: Seq[String]): String =
      ChaosOps.dumpDiagnostics(s"streamchaos-$tbl",
        s"reason: $reason" +: s"seed: $seed" +:
          s"versions: ${scala.util.Try(SnapshotStore.versions(spark, root)).toOption}" +:
          s"consumerOffset: ${scala.util.Try(ChangeFeed.consumerOffset(spark, root, tbl)).toOption}" +:
          (opsLog.toArray(Array.empty[String]).toSeq.map("op: " + _) ++ extra))

    /** Apply one feed batch to the mirror: commit-version order, so a
      * refresh batch's retractions (stamped at the range start) land
      * before its state inserts (stamped at the range end).
      */
    def applyBatch(rows: Seq[(Long, Option[Long], String, Long)]): Unit =
      rows.sortBy(_._4).foreach {
        case (k, _, ChangeFeed.Delete, _) => mirror.remove(k): Unit
        case (k, v, t, _) if t == ChangeFeed.Insert || t == ChangeFeed.UpdatePost =>
          mirror(k) = v.getOrElse(Long.MinValue)
        case _ => () // update_preimage: informational
      }

    /** One AvailableNow drain of the paced feed into the mirror. */
    def drain(label: String): Unit = {
      val q = spark.readStream.format("graft")
        .option("path", root).option("keys", "k")
        .option("startingVersion", "-1")
        .option("consumerId", tbl)
        .option("replaceBoundary", "refresh")
        .option("maxVersionsPerBatch", "3")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          val rows = b.select(col("k"), col("v"),
            col(ChangeFeed.ChangeType), col(ChangeFeed.CommitVersion))
            .as[(Long, Option[Long], String, Long)].collect().toSeq
          mirror.synchronized {
            applyBatch(rows)
            batchSizes += rows.size
            opsLog.add(s"$label batch $id: ${rows.size} rows"): Unit
          }: Unit
        }
        .start()
      assert(q.awaitTermination(300000), s"$label: AvailableNow did not stop")
    }

    val epochN = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new CountDownLatch(1)
    @volatile var mutatorsDone = false

    val muts = (0 until 2).map { t =>
      Future {
        gate.await()
        val rnd = new scala.util.Random(seed * 1000 + t)
        (1 to 10).foreach { i =>
          val op = rnd.nextInt(8)
          opsLog.add(s"mut$t#$i op$op begin"): Unit
          try {
            op match {
              case 0 | 1 | 2 =>
                // upsert keeping k unique: the epoch key (when the
                // current epoch renamed it) is always k + 1000
                val cols = spark.table(s"$catalog.ns.$tbl").columns.toSeq
                val k = rnd.nextInt(40)
                val row =
                  if (cols == Seq("k", "v")) s"($k, ${rnd.nextInt(100)})"
                  else s"(${k + 1000}, $k, ${rnd.nextInt(100)})"
                spark.sql(s"INSERT INTO $catalog.ns.$tbl (${cols.mkString(", ")}) " +
                  s"VALUES $row")
              case 3 =>
                spark.sql(s"DELETE FROM $catalog.ns.$tbl WHERE k = ${rnd.nextInt(40)}")
              case 4 =>
                val c = s"e${epochN.incrementAndGet()}s$t"
                val n = 2 + rnd.nextInt(6)
                spark.sql(s"""REPLACE TABLE $catalog.ns.$tbl
                  TBLPROPERTIES ('keys'='$c', 'numBuckets'='2')
                  AS SELECT id + 1000 AS $c, id AS k,
                            CAST(id * 3 AS BIGINT) AS v FROM range($n)""")
              case 5 =>
                val vs = SnapshotStore.versions(spark, root)
                val target = vs(rnd.nextInt(vs.length))
                opsLog.add(s"mut$t#$i restore -> $target"): Unit
                SnapshotStore.restore(spark, root, target): Unit
              case 6 =>
                if (rnd.nextBoolean()) SnapshotStore.compact(spark, root): Unit
                else SnapshotStore.checkpoint(spark, root): Unit
              case 7 =>
                SnapshotStore.vacuum(spark, root): Unit
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
                s"stream-chaos mutator $t UNDOCUMENTED failure (diag: $p)", e)
          }
        }
      }
    }

    val consumer = Future {
      gate.await()
      var i = 0
      while (!mutatorsDone && i < 40) {
        i += 1
        try drain(s"drain#$i")
        catch {
          case e: Throwable if ChaosOps.documented(e) =>
            opsLog.add(s"drain#$i documented conflict: " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}"): Unit
          case e: Throwable =>
            val p = dump(s"consumer drain#$i UNDOCUMENTED",
              ChaosOps.renderChain(e))
            throw new IllegalStateException(
              s"stream-chaos consumer UNDOCUMENTED failure (diag: $p)", e)
        }
        Thread.sleep(40)
      }
    }

    gate.countDown()
    Await.result(Future.sequence(muts), 1800.seconds): Unit
    mutatorsDone = true
    Await.result(consumer, 1800.seconds): Unit

    // quiescence: one clean final drain must converge the mirror
    // exactly — no documented-conflict escape hatch here
    drain("final")
    val src = spark.table(s"$catalog.ns.$tbl").select(col("k"), col("v"))
      .as[(Long, Long)].collect().map { case (k, v) => k -> v }.toMap
    val mir = mirror.synchronized(mirror.toMap)
    if (mir != src) {
      val p = dump("final divergence",
        Seq(s"source-only: ${src.toSet -- mir.toSet}",
          s"mirror-only: ${mir.toSet -- src.toSet}",
          s"batchSizes: $batchSizes"))
      fail(s"mirror diverged after quiescent drain (diag: $p): " +
        s"source-only ${src.toSet -- mir.toSet}, " +
        s"mirror-only ${mir.toSet -- src.toSet}")
    }
    info(s"$tbl: converged over ${batchSizes.size} batches " +
      s"(${batchSizes.sum} change rows); ops: ${opsLog.size} journal lines")
  }

  test("streaming change-feed consumer converges under source chaos (POSIX)") {
    val warehouse = Files.createTempDirectory("graft-streamchaos").toString
    spark.conf.set("spark.sql.catalog.gscp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gscp.root", warehouse)
    chaosRound("gscp", warehouse, "scp", seed = 15)
  }

  test("streaming change-feed consumer converges under source chaos (osim:// conditional-PUT)") {
    val warehouse =
      "osim://" + Files.createTempDirectory("graft-streamchaos-osim").toString
    spark.conf.set("spark.sql.catalog.gsco", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsco.root", warehouse)
    try chaosRound("gsco", warehouse, "sco", seed = 16)
    finally ObjectStoreSim.reset()
  }
}
