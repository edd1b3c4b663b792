package graft.connector

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.store.SnapshotStore

/** The streaming WRITER chaos body (the write-side twin of
  * [[StreamChaosOps]]): a `writeStream.toTable` V2 epoch writer keeps
  * upserting keyed batches WHILE mutator threads compact / checkpoint
  * / vacuum / rebucket / clone-and-release the same table; at
  * quiescence the table must equal the mirror of every batch applied
  * in order. Maintenance ops never change logical state, so the
  * invariant is exact; a writer epoch that loses its OCC races
  * (documented conflicts) re-runs from the same checkpoint and the
  * per-epoch txn high-water must keep it exactly-once — THAT
  * composition (exactly-once under live maintenance churn, including
  * vacuum's floor-advance serialization commits landing between the
  * writer's own versions) is what this hunt exists to shake.
  *
  * Self-diagnosing like its siblings: every op journals, any failure
  * persists the journal + both end states via
  * [[ChaosOps.dumpDiagnostics]] before the assert fires.
  */
object StreamWriteChaosOps {

  /** Runs one round; returns (epochs committed, rows written). The
    * catalog must already be registered over `warehouse`.
    */
  def run(spark: SparkSession, catalog: String, warehouse: String,
          tbl: String, seed: Int, nMutators: Int = 2, opsPer: Int = 8,
          info: String => Unit = _ => (), dmlMode: String = "cow"): (Int, Long) = {
    val root = s"$warehouse/ns/$tbl"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $catalog.ns")
    // delta personality (r15 verdict item #2): row-level SQL DML in
    // the mutator mix takes the O(changed-rows) WriteDelta/tombstone
    // paths while the stream writer commits epochs
    val modeProps = if (dmlMode == "delta") ", 'dml.mode'='delta'" else ""
    spark.sql(s"""CREATE TABLE $catalog.ns.$tbl (k BIGINT, v BIGINT) USING graft
                  TBLPROPERTIES ('keys'='k', 'numBuckets'='2'$modeProps)""")
    spark.sql(s"INSERT INTO $catalog.ns.$tbl SELECT id, id * 2 FROM range(0, 30)")
    runOn(spark, s"$catalog.ns.$tbl", root, s"$warehouse/ns", tbl, seed,
      nMutators, opsPer, info)
  }

  /** The body, against a PRE-CREATED (k,v)-keyed table — lets the
    * branch hunt point the same writer+mutator mix at a live WAP
    * branch root (`fqn` = the branch's catalog identifier, `root` =
    * the branch directory, `scratch` = where clone cycles fork to).
    */
  def runOn(spark: SparkSession, fqn: String, root: String, scratch: String,
            tag: String, seed: Int, nMutators: Int, opsPer: Int,
            info: String => Unit): (Int, Long) = {
    import spark.implicits._
    val mirror = scala.collection.mutable.Map(
      spark.table(fqn).select(col("k"), col("v"))
        .as[(Long, Long)].collect().toSeq: _*)

    val opsLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def dump(reason: String, extra: Seq[String]): String =
      ChaosOps.dumpDiagnostics(s"streamwrite-$tag",
        s"reason: $reason" +: s"seed: $seed" +:
          s"versions: ${scala.util.Try(SnapshotStore.versions(spark, root)).toOption}" +:
          (opsLog.toArray(Array.empty[String]).toSeq.map("op: " + _) ++ extra))

    val ckpt = Files.createTempDirectory(s"graft-swchaos-$tag").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)]

    val gate = new CountDownLatch(1)
    @volatile var writerDone = false
    var epochs = 0
    var rowsWritten = 0L

    val muts = (0 until nMutators).map { t =>
      Future {
        gate.await()
        val rnd = new scala.util.Random(seed * 1000 + t)
        (1 to opsPer).foreach { i =>
          val op = rnd.nextInt(6)
          opsLog.add(s"mut$t#$i op$op begin"): Unit
          try {
            op match {
              case 0 => SnapshotStore.compact(spark, root): Unit
              case 1 => SnapshotStore.checkpoint(spark, root): Unit
              case 2 => SnapshotStore.vacuum(spark, root,
                keepLast = 1 + rnd.nextInt(3)): Unit
              case 3 => SnapshotStore.rebucket(spark, root, Seq("k"),
                newNumBuckets = 1 + rnd.nextInt(4)): Unit
              case 4 =>
                val cRoot = s"$scratch/${tag}_c$t${rnd.nextInt(1000000)}"
                SnapshotStore.cloneTable(spark, root, cRoot): Unit
                try {
                  val df = SnapshotStore.read(spark, cRoot)
                  if (df.columns.length != 2)
                    throw new IllegalStateException(
                      s"frankenclone at $cRoot: ${df.columns.toSeq}")
                  df.count(): Unit
                } finally SnapshotStore.releaseClone(spark, cRoot)
              case 5 =>
                // a LOGICAL no-op row-level UPDATE: physically it
                // rewrites (CoW) or stages O(changed rows) + runtime
                // filtering (delta) — racing the stream writer's
                // epochs without perturbing the mirror invariant
                spark.sql(s"UPDATE $fqn SET v = v " +
                  s"WHERE k < ${5 + rnd.nextInt(10)}")
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
                s"stream-write-chaos mutator $t UNDOCUMENTED failure (diag: $p)", e)
          }
          Thread.sleep(20)
        }
      }
    }

    def runEpoch(label: String): Unit = {
      val q = in.toDF().toDF("k", "v")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable(fqn)
      assert(q.awaitTermination(300000), s"$label: AvailableNow did not stop")
    }

    val writer = Future {
      gate.await()
      val rnd = new scala.util.Random(seed * 7 + 13)
      (1 to 2 * opsPer).foreach { i =>
        val keys = rnd.shuffle((0L until 40L).toVector).take(3 + rnd.nextInt(4))
        val batch = keys.map(k => k -> rnd.nextInt(1000).toLong)
        batch.foreach { case (k, v) => mirror(k) = v }
        in.addData(batch): Unit
        rowsWritten += batch.size
        // the epoch must eventually land EXACTLY ONCE: documented OCC
        // losses (compaction/rebucket races) re-run from the same
        // checkpoint and the txn high-water suppresses double-applies
        var landed = false
        var laps = 0
        while (!landed) {
          laps += 1
          try { runEpoch(s"epoch#$i lap$laps"); landed = true }
          catch {
            case e: Throwable if laps < 12 && (ChaosOps.documented(e) ||
                ChaosOps.vacuumRace(spark, root, e)) =>
              opsLog.add(s"writer epoch#$i lap$laps documented conflict: " +
                s"${e.getClass.getSimpleName}: ${e.getMessage}"): Unit
            case e: Throwable =>
              val p = dump(s"writer epoch#$i lap$laps UNDOCUMENTED",
                ChaosOps.renderChain(e))
              throw new IllegalStateException(
                s"stream-write-chaos writer UNDOCUMENTED failure (diag: $p)", e)
          }
        }
        epochs += 1
        opsLog.add(s"writer epoch#$i landed (${batch.size} rows)"): Unit
      }
    }

    gate.countDown()
    Await.result(writer, 1800.seconds): Unit
    writerDone = true
    Await.result(Future.sequence(muts), 1800.seconds): Unit

    val src = spark.table(fqn).select(col("k"), col("v"))
      .as[(Long, Long)].collect().map { case (k, v) => k -> v }.toMap
    val mir = mirror.toMap
    if (src != mir) {
      val p = dump("final divergence",
        Seq(s"table-only: ${src.toSet -- mir.toSet}",
          s"mirror-only: ${mir.toSet -- src.toSet}"))
      throw new AssertionError(
        s"table diverged from the written mirror (diag: $p): " +
          s"table-only ${src.toSet -- mir.toSet}, " +
          s"mirror-only ${mir.toSet -- src.toSet}")
    }
    // every retained version still reads as a coherent two-column frame
    SnapshotStore.versions(spark, root).foreach { v =>
      val df = spark.sql(s"SELECT * FROM $fqn VERSION AS OF $v")
      if (df.columns.length != 2) {
        val p = dump(s"version $v not two-column", Seq(s"cols: ${df.columns.toSeq}"))
        throw new AssertionError(s"version $v not a two-column frame (diag: $p)")
      }
    }
    info(s"$tag: $epochs epochs, $rowsWritten rows, converged")
    (epochs, rowsWritten)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
