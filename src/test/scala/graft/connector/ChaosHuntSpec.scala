package graft.connector

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.hadoop.fs.Path

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

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def documented(e: Throwable): Boolean = {
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

  private def hunt(round: Int, nThreads: Int, opsPer: Int): Unit = {
    val tbl = s"h$round"
    val root = s"$warehouse/ns/$tbl"
    spark.sql(s"""CREATE TABLE gch.ns.$tbl (k BIGINT, v BIGINT) USING graft
                  TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql(s"INSERT INTO gch.ns.$tbl VALUES (1, 0)")
    val epochN = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val futs = (0 until nThreads).map { t =>
      Future {
        gate.await()
        val rnd = new scala.util.Random(round * 100 + t)
        var landed, conflicted = 0
        (1 to opsPer).foreach { _ =>
          try {
            rnd.nextInt(8) match {
              case 0 =>
                val cols = spark.table(s"gch.ns.$tbl").columns
                val key =
                  if (cols.head == "k") rnd.nextInt(40).toString
                  else s"'x${rnd.nextInt(40)}'"
                spark.sql(s"INSERT INTO gch.ns.$tbl (${cols.mkString(", ")}) " +
                  s"VALUES ($key, ${rnd.nextInt(100)})")
              case 1 =>
                val cols = spark.table(s"gch.ns.$tbl").columns
                spark.sql(s"DELETE FROM gch.ns.$tbl WHERE ${cols.head} = " +
                  (if (cols.head == "k") rnd.nextInt(40).toString
                   else s"'x${rnd.nextInt(40)}'"))
              case 2 =>
                val c = s"e${epochN.incrementAndGet()}t$t"
                spark.sql(s"""REPLACE TABLE gch.ns.$tbl
                  TBLPROPERTIES ('keys'='$c')
                  AS SELECT 'r' AS $c, CAST(1 AS BIGINT) AS n""")
              case 3 =>
                val vs = SnapshotStore.versions(spark, root)
                SnapshotStore.restore(spark, root,
                  vs(rnd.nextInt(vs.length))): Unit
              case 4 => SnapshotStore.compact(spark, root): Unit
              case 5 => SnapshotStore.createTag(spark, root,
                s"h$round-t$t-${rnd.nextInt(1000000)}"): Unit
              case 6 => SnapshotStore.checkpoint(spark, root): Unit
              case 7 => // WAP under chaos: fork, one-row write, publish
                val bn = s"b$round-$t-${rnd.nextInt(1000000)}"
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
          } catch {
            case e: Throwable if documented(e) => conflicted += 1
            case e: Throwable =>
              throw new IllegalStateException(
                s"round $round thread $t UNDOCUMENTED failure", e)
          }
        }
        (landed, conflicted)
      }
    }
    gate.countDown()
    val outcomes = Await.result(Future.sequence(futs), 1800.seconds)
    // quiesce, then sweep
    spark.sql(s"ALTER TABLE gch.ns.$tbl SET TBLPROPERTIES ('cq'='1')")
    val stamped = SnapshotStore.readProps(spark, root)("graft.schema.epoch").toLong
    val newestEpoch = spark.sql(
      s"""SELECT max(version) FROM gch.ns.$tbl.meta_history
         WHERE is_epoch_start""").collect().head.getLong(0)
    assert(stamped == newestEpoch,
      s"round $round: stamp $stamped vs newest flagged $newestEpoch")
    SnapshotStore.versions(spark, root).foreach { v =>
      val df = spark.sql(s"SELECT * FROM gch.ns.$tbl VERSION AS OF $v")
      assert(df.columns.length == 2 && df.count() >= 0L,
        s"round $round: version $v not a readable two-column frame " +
          s"(${df.columns.toSeq})")
    }
    assert(!fs.listStatus(new Path(root)).exists(
      _.getPath.getName.startsWith("_pending_contracts-")),
      s"round $round: unconsumed bundles")
    info(s"round $round: ${outcomes.map(_._1).sum} landed, " +
      s"${outcomes.map(_._2).sum} documented conflicts")
  }

  (1 to 4).foreach { round =>
    test(s"contract-op chaos hunt round $round (4 threads x 10 ops)") {
      hunt(round, nThreads = 4, opsPer = 10)
    }
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
    val muts = (0 until 2).map { t =>
      Future {
        gate.await()
        val rnd = new scala.util.Random(7000 + t)
        (1 to 8).foreach { _ =>
          try {
            rnd.nextInt(5) match {
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
                SnapshotStore.restore(spark, root,
                  vs(new scala.util.Random().nextInt(vs.length))): Unit
            }
          } catch {
            case e: Throwable if documented(e) => ()
            case e: Throwable => throw new IllegalStateException(
              s"sync-chaos mutator $t UNDOCUMENTED failure", e)
          }
        }
      }
    }
    val syncer = Future {
      gate.await()
      (1 to 10).foreach { _ =>
        try graft.store.ChangeFeed.syncDerived(spark, root, dRoot, "cs",
          keys = srcKeys(), numBuckets = 4): Unit
        catch {
          case e: Throwable if documentedSync(e) => ()
          case e: Throwable => throw new IllegalStateException(
            "sync-chaos syncer UNDOCUMENTED failure", e)
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
    assert(mir == src,
      s"mirror diverged after quiescent sync: source $src, mirror $mir")
  }
}
