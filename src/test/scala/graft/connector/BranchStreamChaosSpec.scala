package graft.connector

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.store.{ChangeFeed, SnapshotStore}

/** The STREAMING variants of the branch-interior hunt (the r15
  * verdict's #1 item names "the streaming consumer/writer variants"
  * against a long-lived WAP branch): a branch is a full graft table,
  * so its change feed must behave like any table's — including while
  * branch-side DML and maintenance churn it, while MAIN mutates the
  * shared fork-time directories underneath, and when a publish
  * CONSUMES the branch under a running consumer's feet.
  */
class BranchStreamChaosSpec extends SparkSpec {

  private val warehouse = Files.createTempDirectory("graft-brstream").toString
  locally {
    spark.conf.set("spark.sql.catalog.bsw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bsw.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bsw.ns")
  }

  private def byKey(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    import spark.implicits._
    df.select(col("k"), col("v")).as[(Long, Long)].collect().toMap
  }

  test("branch change-feed consumer converges under branch DML + maintenance chaos") {
    spark.sql("""CREATE TABLE bsw.ns.s (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO bsw.ns.s SELECT id, id * 2 FROM range(0, 30)")
    val root = s"$warehouse/ns/s"
    SnapshotStore.createBranch(spark, root, "sb"): Unit
    val br = SnapshotStore.branchRoot(root, "sb")
    spark.conf.set("spark.sql.catalog.bsb", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bsb.root", root)
    val brTable = "bsb.`_branch`.sb"

    val mirror = scala.collection.mutable.Map.empty[Long, Long]
    val ckpt = Files.createTempDirectory("graft-brstream-ck").toString
    def drain(label: String): Unit = {
      import spark.implicits._
      val q = spark.readStream.format("graft")
        .option("path", root).option("branch", "sb")
        .option("keys", "k").option("startingVersion", "-1")
        .option("consumerId", "sbc").option("maxVersionsPerBatch", "3")
        .option("replaceBoundary", "refresh")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          val rows = b.select(col("k"), col("v"),
            col(ChangeFeed.ChangeType), col(ChangeFeed.CommitVersion))
            .as[(Long, Option[Long], String, Long)].collect().toSeq
          mirror.synchronized {
            rows.sortBy(_._4).foreach {
              case (k, _, ChangeFeed.Delete, _) => mirror.remove(k): Unit
              case (k, v, t, _) if t == ChangeFeed.Insert ||
                  t == ChangeFeed.UpdatePost =>
                mirror(k) = v.getOrElse(Long.MinValue)
              case _ => ()
            }
          }: Unit
        }
        .start()
      assert(q.awaitTermination(300000), s"$label: AvailableNow did not stop")
    }
    def documented(e: Throwable): Boolean =
      ChaosOps.documented(e) || ChaosOps.vacuumRace(spark, br, e) ||
        ChaosOps.vacuumRace(spark, root, e)

    val gate = new CountDownLatch(1)
    @volatile var mutatorDone = false
    val mut = Future {
      gate.await()
      val rnd = new scala.util.Random(61)
      (1 to 12).foreach { i =>
        try rnd.nextInt(8) match {
          case 0 | 1 =>
            spark.sql(s"INSERT INTO $brTable VALUES (${rnd.nextInt(40)}, " +
              s"${rnd.nextInt(100)})")
          case 2 =>
            spark.sql(s"DELETE FROM $brTable WHERE k = ${rnd.nextInt(40)}")
          case 3 =>
            spark.sql(s"UPDATE $brTable SET v = ${rnd.nextInt(100)} " +
              s"WHERE k = ${rnd.nextInt(40)}")
          case 4 => SnapshotStore.compact(spark, br): Unit
          case 5 => SnapshotStore.vacuum(spark, br): Unit
          case 6 => // main DML — must NOT leak into the branch feed
            spark.sql(s"INSERT INTO bsw.ns.s VALUES (${900 + i}, 1)")
          case 7 => // main vacuum — the fork pin must protect shared dirs
            SnapshotStore.vacuum(spark, root): Unit
        } catch {
          case e: Throwable if documented(e) => ()
        }
        Thread.sleep(30)
      }
      mutatorDone = true
    }
    val consumer = Future {
      gate.await()
      (1 to 6).foreach { i =>
        try drain(s"drain#$i")
        catch { case e: Throwable if documented(e) => () }
        Thread.sleep(40)
      }
    }
    gate.countDown()
    Await.result(Future.sequence(Seq(mut, consumer)), 600.seconds): Unit
    // quiescence: one clean drain, then mirror ≡ the BRANCH state (and
    // the main-side inserts must NOT have leaked into the mirror)
    drain("final")
    val branchState = byKey(SnapshotStore.read(spark, br))
    assert(mirror.toMap == branchState,
      s"mirror diverged: mirror-only ${mirror.toMap.toSet -- branchState.toSet}, " +
        s"branch-only ${branchState.toSet -- mirror.toMap.toSet}")
    assert(!mirror.keys.exists(_ >= 900),
      "main-side inserts leaked into the BRANCH's change feed")
  }

  test("toTable writer INTO a live branch converges exactly-once under branch+main chaos; a stale-base publish refuses with the recipe") {
    // the streaming WRITER variant of the branch hunt: the full
    // StreamWriteChaosOps body (epoch writer + compact/checkpoint/
    // vacuum/rebucket/clone/no-op-UPDATE mutators) pointed at a BRANCH
    // root, while a side loop churns MAIN (inserts + vacuum) — the
    // fork pin must keep the branch's shared base dirs alive the whole
    // time; afterwards, because main advanced under the fork, the
    // publish must refuse with the documented re-fork recipe and leave
    // the audited branch whole.
    spark.sql("""CREATE TABLE bsw.ns.w (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO bsw.ns.w SELECT id, id * 2 FROM range(0, 30)")
    val root = s"$warehouse/ns/w"
    SnapshotStore.createBranch(spark, root, "wb"): Unit
    val br = SnapshotStore.branchRoot(root, "wb")
    spark.conf.set("spark.sql.catalog.bswb", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bswb.root", root)
    val scratch = Files.createTempDirectory("graft-brstream-scratch").toString
    @volatile var done = false
    val mainChurn = Future {
      val rnd = new scala.util.Random(71)
      var i = 0
      while (!done) {
        i += 1
        try {
          if (rnd.nextBoolean())
            spark.sql(s"INSERT INTO bsw.ns.w VALUES (${800 + i}, 1)")
          else SnapshotStore.vacuum(spark, root): Unit
        } catch { case e: Throwable if ChaosOps.documented(e) => () }
        Thread.sleep(60)
      }
    }
    try {
      val (epochs, rows) = StreamWriteChaosOps.runOn(spark,
        "bswb.`_branch`.wb", br, scratch, "wb", seed = 72,
        nMutators = 2, opsPer = 5, info = info(_))
      assert(epochs > 0 && rows > 0)
    } finally done = true
    Await.result(mainChurn, 120.seconds): Unit
    // publish the audited branch — but main advanced (the churn), so
    // the documented path is refuse → re-fork → re-apply; assert the
    // REFUSAL recipe fires (the writer's data was audited on a stale
    // base) rather than pretending the fast-forward can land
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.publishBranch(spark, root, "wb")
    }
    assert(e.getMessage.contains("advanced") ||
      e.getMessage.contains("re-create"), s"wrong refusal: ${e.getMessage}")
    // and the branch itself is still whole after the refusal
    assert(SnapshotStore.read(spark, br).count() > 0L)
    SnapshotStore.dropBranch(spark, root, "wb")
  }

  test("a consumer whose branch was consumed and re-forked is loud or convergent, never silently wrong") {
    spark.sql("""CREATE TABLE bsw.ns.c (k BIGINT, v BIGINT) USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO bsw.ns.c SELECT id, id FROM range(0, 10)")
    val root = s"$warehouse/ns/c"
    SnapshotStore.createBranch(spark, root, "cb"): Unit
    val br = SnapshotStore.branchRoot(root, "cb")
    spark.conf.set("spark.sql.catalog.bsc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bsc.root", root)
    spark.sql("INSERT INTO bsc.`_branch`.cb VALUES (100, 100)")

    val mirror = scala.collection.mutable.Map.empty[Long, Long]
    val ckpt = Files.createTempDirectory("graft-brstream-ck2").toString
    def drain(): Unit = {
      import spark.implicits._
      val q = spark.readStream.format("graft")
        .option("path", root).option("branch", "cb")
        .option("keys", "k").option("startingVersion", "-1")
        .option("replaceBoundary", "refresh")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          val rows = b.select(col("k"), col("v"),
            col(ChangeFeed.ChangeType), col(ChangeFeed.CommitVersion))
            .as[(Long, Option[Long], String, Long)].collect().toSeq
          rows.sortBy(_._4).foreach {
            case (k, _, ChangeFeed.Delete, _) => mirror.remove(k): Unit
            case (k, v, t, _) if t == ChangeFeed.Insert ||
                t == ChangeFeed.UpdatePost =>
              mirror(k) = v.getOrElse(Long.MinValue)
            case _ => ()
          }
        }
        .start()
      assert(q.awaitTermination(300000), "drain did not stop")
    }
    drain() // consumer established on generation 1
    assert(mirror.contains(100L))
    // the branch is CONSUMED (publish) and a successor re-forked under
    // the same name — the consumer's offsets now name a DEAD history
    assert(SnapshotStore.publishBranch(spark, root, "cb") > 0L)
    SnapshotStore.createBranch(spark, root, "cb"): Unit
    spark.sql("INSERT INTO bsc.`_branch`.cb VALUES (200, 200)")
    val outcome = scala.util.Try(drain())
    val successor = byKey(SnapshotStore.read(spark, br))
    outcome match {
      case scala.util.Failure(e) =>
        // loud is fine — and it must be a DOCUMENTED class
        val chain = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).take(8)
          .flatMap(x => Option(x.getMessage)).mkString("\n")
        assert(ChaosOps.documented(e) || chain.contains("STALE") ||
          chain.contains("vacuumed") || chain.contains("no committed"),
          s"undocumented failure shape: $chain")
      case scala.util.Success(_) =>
        // convergent is fine too — but NEVER a silent divergence
        assert(mirror.toMap == successor,
          s"silently wrong after re-fork: mirror ${mirror.toMap}, " +
            s"successor $successor")
    }
  }
}
