package graft.connector

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.store.{ChangeFeed, SnapshotStore}

/** The streaming change-feed chaos body shared by [[StreamChaosSpec]]
  * (suite-resident, default intensity, POSIX + conditional-PUT osim)
  * and `graft.tools.StreamChaosBlast` (high intensity, all three store
  * personalities): a paced rate-limited consumer (`consumerId`,
  * `maxVersionsPerBatch`, `replaceBoundary=refresh`) drains repeatedly
  * WHILE mutator threads churn the source; after quiescence one clean
  * drain must leave the merge-applied mirror EXACTLY equal to the
  * source. Every mutator epoch keeps the consumer identity column `k`
  * unique state-wide (the epoch key is an injective function of `k`),
  * so convergence is well-defined across any interleaving. Vacuum runs
  * in the mix on purpose — the registered consumer's retention floor
  * must keep every version an uncommitted batch still needs.
  *
  * Self-diagnosing (the r14 flake-ledger lesson): every op and batch
  * journals, and any failure persists journal + both end states via
  * [[ChaosOps.dumpDiagnostics]] before the assert fires.
  */
object StreamChaosOps {

  /** Runs one full round; returns (batches drained, change rows seen).
    * The catalog must already be registered over `warehouse`.
    */
  def run(spark: SparkSession, catalog: String, warehouse: String,
          tbl: String, seed: Int, nMutators: Int = 2, opsPer: Int = 10,
          info: String => Unit = _ => ()): (Int, Int) = {
    import spark.implicits._
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

    val muts = (0 until nMutators).map { t =>
      Future {
        gate.await()
        val rnd = new scala.util.Random(seed * 1000 + t)
        (1 to opsPer).foreach { i =>
          val op = rnd.nextInt(11)
          opsLog.add(s"mut$t#$i op$op begin"): Unit
          try {
            op match {
              case 0 | 1 | 2 =>
                // upsert keeping k unique: the epoch key (when the
                // current epoch renamed it) is always k + 1000.
                // POSITIONAL values on purpose: a NAMED subset insert
                // built from a stale pre-REPLACE shape would silently
                // NULL-FILL the new epoch's merge key (SQL default
                // semantics) and break k-uniqueness with a coexisting
                // null-key row — found live by StreamChaosBlast; a
                // stale positional arity instead fails loudly as the
                // documented not-enough-columns conflict
                val cols = spark.table(s"$catalog.ns.$tbl").columns.toSeq
                if (cols.isEmpty) throw new java.util.ConcurrentModificationException(
                  s"$tbl resolved mid-swap with no columns; re-run")
                val k = rnd.nextInt(40)
                val row =
                  if (cols == Seq("k", "v")) s"($k, ${rnd.nextInt(100)})"
                  else s"(${k + 1000}, $k, ${rnd.nextInt(100)})"
                spark.sql(s"INSERT INTO $catalog.ns.$tbl VALUES $row")
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
              case 8 =>
                // row-level SQL UPDATE: k and v exist in BOTH epoch
                // shapes ((k,v) and (cN,k,v)) — the feed must emit the
                // group rewrite as pre/post-image rows
                spark.sql(s"UPDATE $catalog.ns.$tbl SET v = ${rnd.nextInt(100)} " +
                  s"WHERE k = ${rnd.nextInt(40)}")
              case 9 =>
                // SQL MERGE keyed on k (k stays unique state-wide; the
                // epoch key, when present, is the injective k + 1000)
                val cols = spark.table(s"$catalog.ns.$tbl").columns.toSeq
                val mk = rnd.nextInt(40)
                val mv = rnd.nextInt(100)
                if (cols == Seq("k", "v"))
                  // update-only in the 2-col shape: a WHEN NOT MATCHED
                  // INSERT (k, v) executed against a 3-col epoch the
                  // REPLACE installed mid-statement would null-fill
                  // the new merge key (same hazard as the named-subset
                  // insert above) — matched-update can never mint rows
                  spark.sql(
                    s"""MERGE INTO $catalog.ns.$tbl t
                       USING (SELECT CAST($mk AS BIGINT) AS mk, CAST($mv AS BIGINT) AS mv) s
                       ON t.k = s.mk
                       WHEN MATCHED THEN UPDATE SET v = s.mv""")
                else if (cols.length == 3 && cols.takeRight(2) == Seq("k", "v"))
                  spark.sql(
                    s"""MERGE INTO $catalog.ns.$tbl t
                       USING (SELECT CAST($mk AS BIGINT) AS mk, CAST($mv AS BIGINT) AS mv) s
                       ON t.k = s.mk
                       WHEN MATCHED THEN UPDATE SET v = s.mv
                       WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
                         VALUES (s.mk + 1000, s.mk, s.mv)""")
                else throw new java.util.ConcurrentModificationException(
                  s"$tbl resolved mid-swap with columns $cols; re-run")
              case 10 =>
                // bucket-count evolution UNDER the running consumer:
                // the feed's diff is row-keyed, so a rebucket must
                // surface as a ZERO-change step, never corruption
                val keys = SnapshotStore.readProps(spark, root)
                  .getOrElse("keys", "k").split(",").map(_.trim).toSeq
                SnapshotStore.rebucket(spark, root, keys,
                  newNumBuckets = 1 + rnd.nextInt(4)): Unit
            }
            opsLog.add(s"mut$t#$i op$op landed"): Unit
          } catch {
            case e: Throwable if ChaosOps.documented(e) ||
                ChaosOps.vacuumRace(spark, root, e) =>
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
      while (!mutatorsDone && i < 4 * opsPer) {
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
    // k-uniqueness is the hunt's own precondition (mirror and source
    // are compared as k→v maps): if it broke, the divergence message
    // would mislead — diagnose the duplicate crisply instead
    val dupes = spark.table(s"$catalog.ns.$tbl").groupBy("k").count()
      .where(col("count") > 1).collect()
    if (dupes.nonEmpty) {
      val p = dump("k-uniqueness broken",
        dupes.map(r => s"duplicate k: $r").toSeq)
      throw new AssertionError(
        s"key uniqueness broken — an op minted a duplicate/null-key row " +
          s"(diag: $p): ${dupes.mkString(", ")}")
    }
    val src = spark.table(s"$catalog.ns.$tbl").select(col("k"), col("v"))
      .as[(Long, Long)].collect().map { case (k, v) => k -> v }.toMap
    val mir = mirror.synchronized(mirror.toMap)
    if (mir != src) {
      val p = dump("final divergence",
        Seq(s"source-only: ${src.toSet -- mir.toSet}",
          s"mirror-only: ${mir.toSet -- src.toSet}",
          s"batchSizes: $batchSizes"))
      throw new AssertionError(
        s"mirror diverged after quiescent drain (diag: $p): " +
          s"source-only ${src.toSet -- mir.toSet}, " +
          s"mirror-only ${mir.toSet -- src.toSet}")
    }
    info(s"$tbl: converged over ${batchSizes.size} batches " +
      s"(${batchSizes.sum} change rows); ops: ${opsLog.size} journal lines")
    (batchSizes.size, batchSizes.sum)
  }
}
