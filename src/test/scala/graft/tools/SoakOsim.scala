package graft.tools

import java.util.concurrent.CountDownLatch

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.{ObjectStoreSim, SnapshotStore}

/** Scale OCC soak ON THE OBJECT-STORE SIMULATOR — the osim twin of
  * `graft.tools.Soak`'s §3 (whose artifact is POSIX): the scaled
  * corpus, the 8-writer disjoint-bucket fleet, the publish-vs-commit
  * race, the racing REPLACEs and a contract-op chaos fleet all run
  * against `osim://` semantics (PUT-visible-on-close, close-time
  * conditional create, copy+delete rename).
  *
  * The EXPECTED differences from the POSIX artifact are themselves the
  * point and are asserted, not excused:
  *  - rebase-by-rename declines on object stores, so every lost
  *    version race resolves by the always-correct MERGE RECOMPUTE —
  *    the fleet must stay LOSSLESS (every writer's rows present, total
  *    row count intact, distinct versions) while `occ_merge_recomputes`
  *    records the documented extra work;
  *  - branch publish adopts by COPY (source preserved), so a raced
  *    publish rolls back by discarding its partial copies — the branch
  *    must stay whole either way.
  *
  * Usage: Test/runMain graft.tools.SoakOsim [scale] [outJson] [mode]
  * — mode `conditional` (default) is a conditional-PUT store; mode
  * `plainput-arb` turns conditional creates OFF and plugs in the
  * [[graft.store.InMemoryClaimArbiter]]: the hardest personality the
  * §5 matrix allows, at scale. (Test scope: the simulator and the
  * shared chaos body live there.)
  */
object SoakOsim {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = if (args.length > 1) args(1) else "SOAK_r14b.json"
    val mode = if (args.length > 2) args(2) else "conditional"
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.hadoopConfiguration.set(
      "fs.osim.impl", classOf[ObjectStoreSim].getName)
    if (mode == "plainput-arb") {
      ObjectStoreSim.conditionalCreate = false
      SnapshotStore.manifestArbiter =
        Some(new graft.store.InMemoryClaimArbiter())
      println("[soak-osim] mode: PLAIN-PUT store + external claim arbiter")
    }

    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ").head.toDouble
      catch { case _: Throwable => -1.0 }
    val load0 = loadavg()
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, math.round((System.nanoTime() - t0) / 1e6) / 1e3)
    }
    def ms(v: Double): Double = math.round(v * 1000) / 1000.0
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def phase[A](name: String)(body: => A): A = {
      val (a, t) = timed(body); times(name) = t
      println(f"[soak-osim] $name%-28s $t%8.3fs")
      a
    }

    val work = "osim://" + java.nio.file.Files
      .createTempDirectory("graft-soak-osim").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)

    // ------------- corpus: orders ×scale through osim -----------------
    val orders0 = graft.Tables.orders(spark, baseDir)
    val shift = orders0.agg(max("o_orderkey")).head().getLong(0) + 1L
    phase("gen") {
      orders0.crossJoin(spark.range(scale).select(col("id").as("__rep")))
        .withColumn("o_orderkey", col("o_orderkey") + col("__rep") * shift)
        .drop("__rep")
        .write.mode("overwrite").parquet(s"$work/orders.parquet")
    }
    val orders = spark.read.parquet(s"$work/orders.parquet")
    val totalOrders = orders.count()
    counts("rows") = totalOrders

    // ------------- (a) disjoint-bucket writer fleet -------------------
    val occRoot = s"$work/occ_orders"
    val occNb = 64
    val nWriters = 8
    phase("occ_init") {
      SnapshotStore.init(spark, occRoot, orders, Seq("o_orderkey"),
        numBuckets = occNb, statsCols = Seq("o_orderkey")): Unit
    }
    val v0occ = SnapshotStore.latestVersion(spark, occRoot).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("b").orderBy("o_orderkey")
    val perBucket: Map[Int, Array[Long]] = orders
      .select(col("o_orderkey"),
        pmod(hash(col("o_orderkey")), lit(occNb)).as("b"))
      .where(col("b") < nWriters)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 200)
      .select(col("b"), col("o_orderkey"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).map { case (b, ks) => b -> ks.map(_._2) }
    val mergeRuns = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val futs = (0 until nWriters).map { i =>
      Future {
        gate.await()
        val ks = perBucket(i)
        val delta = orders
          .where(col("o_orderkey").isin(ks.map(Long.box).toSeq: _*))
          .withColumn("o_orderstatus", lit(s"W$i"))
        SnapshotStore.commitDelta(spark, occRoot, delta, Seq("o_orderkey"),
          (cur, d) => {
            mergeRuns.incrementAndGet()
            SnapshotStore.upsertMerge(Seq("o_orderkey"))(cur, d)
          }, maxAttempts = 4 * nWriters)
      }
    }
    val writerVersions = phase("occ_disjoint_fleet") {
      gate.countDown()
      Await.result(Future.sequence(futs), 1800.seconds)
    }
    require(writerVersions.toSet.size == nWriters &&
      SnapshotStore.latestVersion(spark, occRoot).get == v0occ + nWriters,
      s"OCC fleet: expected $nWriters distinct commits, got $writerVersions")
    val occState = SnapshotStore.read(spark, occRoot)
    (0 until nWriters).foreach { i =>
      val got = occState.where(col("o_orderstatus") === s"W$i").count()
      require(got == perBucket(i).length,
        s"writer $i lost rows: $got != ${perBucket(i).length}")
    }
    require(occState.count() == totalOrders, "OCC fleet changed row count")
    counts("occ_writers") = nWriters.toLong
    counts("occ_commits") = writerVersions.toSet.size.toLong
    // rebase-by-rename DECLINES on object stores: every lost race is a
    // lossless merge recompute — record the documented cost, bound it
    // by the theoretical maximum, and above all prove losslessness
    val recomputes = (mergeRuns.get() - nWriters).toLong
    counts("occ_merge_recomputes") = recomputes
    require(recomputes >= 0 && recomputes < nWriters.toLong * nWriters,
      s"recompute count out of sane bounds: $recomputes")
    println(s"[soak-osim] fleet lossless; $recomputes lossless merge " +
      "recomputes (rebase declines on object stores by design)")

    // ------------- (b) publish racing a main commit -------------------
    phase("occ_publish_race") {
      SnapshotStore.createBranch(spark, occRoot, "race")
      val br = SnapshotStore.branchRoot(occRoot, "race")
      SnapshotStore.commitDelta(spark, br,
        orders.limit(50).withColumn("o_orderstatus", lit("R")),
        Seq("o_orderkey"), SnapshotStore.upsertMerge(Seq("o_orderkey")))
      val pubFut = Future {
        try Right(SnapshotStore.publishBranch(spark, occRoot, "race"))
        catch { case e: Throwable => Left(e) }
      }
      val comFut = Future {
        try Right(SnapshotStore.commitDelta(spark, occRoot,
          orders.limit(1).withColumn("o_orderstatus", lit("M")),
          Seq("o_orderkey"), SnapshotStore.upsertMerge(Seq("o_orderkey"))))
        catch { case e: Throwable => Left(e) }
      }
      val (pubRes, comRes) =
        (Await.result(pubFut, 600.seconds), Await.result(comFut, 600.seconds))
      require(comRes.isRight, s"plain commit must land: $comRes")
      pubRes match {
        case Right(v) =>
          counts("occ_publish_won") = 1L
          require(SnapshotStore.readVersion(spark, occRoot, v.asInstanceOf[Long])
            .where(col("o_orderstatus") === "R").count() == 50L)
        case Left(e: java.util.ConcurrentModificationException) =>
          counts("occ_publish_won") = 0L
          // the loser's branch must be WHOLE (rollback discards the
          // partial adoption copies; it never nests junk into the br)
          val brRows = SnapshotStore.read(spark,
            SnapshotStore.branchRoot(occRoot, "race"))
            .where(col("o_orderstatus") === "R").count()
          require(brRows == 50L, s"branch torn after raced publish: $brRows")
          require(e.getMessage != null)
        case Left(e) => throw new IllegalStateException("undocumented publish failure", e)
      }
    }

    // ------------- (c) racing REPLACEs through the catalog ------------
    val whouse = s"$work/wh"
    spark.conf.set("spark.sql.catalog.sosim",
      classOf[graft.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sosim.root", whouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sosim.ns")
    phase("occ_rtas_race") {
      spark.sql("""CREATE TABLE sosim.ns.r (k BIGINT, v BIGINT) USING graft
                   TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
      spark.sql("INSERT INTO sosim.ns.r VALUES (1, 1)")
      val g2 = new CountDownLatch(1)
      val reps = Seq("a", "b").map { c =>
        Future {
          g2.await()
          try Right(spark.sql(s"""REPLACE TABLE sosim.ns.r
            TBLPROPERTIES ('keys'='$c')
            AS SELECT 'x' AS $c, CAST(1 AS BIGINT) AS n"""))
          catch { case e: Throwable => Left(e) }
        }
      }
      g2.countDown()
      val outs = Await.result(Future.sequence(reps), 900.seconds)
      val oks = outs.count(_.isRight)
      counts("occ_rtas_landed") = oks.toLong
      require(oks >= 1, s"at least one REPLACE must land: $outs")
      val rRoot = s"$whouse/ns/r"
      val head = SnapshotStore.latestVersion(spark, rRoot).get
      // swaps serialized: stamp at the newest flagged version, head
      // readable under exactly one replacement's contract
      val stamped = SnapshotStore.readProps(spark, rRoot)("graft.schema.epoch").toLong
      require(stamped == head || !SnapshotStore.isEpochStart(spark, rRoot, head),
        s"epoch stamp $stamped vs head $head")
      val cols = spark.table("sosim.ns.r").columns.toSeq
      require(cols == Seq("a", "n") || cols == Seq("b", "n"),
        s"head schema torn: $cols")
      SnapshotStore.versions(spark, rRoot).foreach { v =>
        spark.sql(s"SELECT * FROM sosim.ns.r VERSION AS OF $v").count(): Unit
      }
    }

    // ------------- (d) contract-op chaos fleet ------------------------
    phase("contract_chaos") {
      graft.connector.ChaosOps.hunt(spark, "sosim", whouse, "soakos",
        seed = 99, nThreads = 4, opsPer = 10, info = s => println(s"[soak-osim] $s"))
      counts("chaos_threads") = 4L
      counts("chaos_ops") = 40L
    }

    pool.shutdown()
    val loadN = loadavg()
    def jmap[A](m: Iterable[(String, A)])(f: A => String): String =
      m.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    ObjectStoreSim.reset()
    SnapshotStore.manifestArbiter = None
    val json =
      s"""{"metric":"soak_osim","mode":"$mode","scale":$scale,"unit":"sec","base_sf":"$baseDir",""" +
        s""""loadavg_start":$load0,"loadavg_end":$loadN,""" +
        s""""times":${jmap(times)(v => ms(v).toString)},""" +
        s""""counts":${jmap(counts)(_.toString)}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
