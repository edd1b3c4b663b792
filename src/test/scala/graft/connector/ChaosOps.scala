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
  * seeded threads racing random streams of inserts, MoR deletes,
  * schema-changing REPLACEs, restores, compactions, tags, checkpoints,
  * and WAP branch fork→write→publish cycles against ONE catalog table,
  * then the quiescence invariants — epoch stamp at the newest flagged
  * version, every retained version a readable two-column time-travel
  * frame, zero unconsumed write-ahead bundles. Extracting it keeps the
  * op vocabulary identical across filesystems, so an osim-only failure
  * isolates an object-store-semantics hole, not a different workload.
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
           x.getMessage.contains("lost") && x.getMessage.contains("race"))
    }
  }

  /** Runs one hunt round; returns (landed, documented conflicts).
    * `catalog` must already be registered over `warehouse`; the table
    * `<catalog>.ns.<tbl>` is created here and chaosed in place.
    */
  def hunt(spark: SparkSession, catalog: String, warehouse: String,
           tbl: String, seed: Int, nThreads: Int, opsPer: Int,
           info: String => Unit): (Int, Int) = {
    val root = s"$warehouse/ns/$tbl"
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql(s"""CREATE TABLE $catalog.ns.$tbl (k BIGINT, v BIGINT) USING graft
                  TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
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
          val op = rnd.nextInt(8)
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
                  TBLPROPERTIES ('keys'='$c')
                  AS SELECT 'r' AS $c, CAST(1 AS BIGINT) AS n""")
              case 3 =>
                val vs = SnapshotStore.versions(spark, root)
                SnapshotStore.restore(spark, root,
                  vs(rnd.nextInt(vs.length))): Unit
              case 4 => SnapshotStore.compact(spark, root): Unit
              case 5 => SnapshotStore.createTag(spark, root,
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
            }
            landed += 1
            opsLog.add(s"t$t#$i op$op landed"): Unit
          } catch {
            case e: Throwable if documented(e) =>
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
    val stamped = SnapshotStore.readProps(spark, root)("graft.schema.epoch").toLong
    val newestEpoch = spark.sql(
      s"""SELECT max(version) FROM $catalog.ns.$tbl.meta_history
         WHERE is_epoch_start""").collect().head.getLong(0)
    if (stamped != newestEpoch) {
      val p = dump("quiescence: stamp vs newest flagged", Seq(
        s"stamped: $stamped", s"newestEpoch: $newestEpoch"))
      assert(false,
        s"hunt $tbl: stamp $stamped vs newest flagged $newestEpoch (diag: $p)")
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
    val (landed, conflicted) = (outcomes.map(_._1).sum, outcomes.map(_._2).sum)
    info(s"hunt $tbl: $landed landed, $conflicted documented conflicts")
    (landed, conflicted)
  }
}
