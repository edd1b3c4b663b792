package graft.tools

import org.apache.spark.sql.SparkSession

import graft.connector.{GraftCatalog, IdentityChaosOps}
import graft.store.{InMemoryClaimArbiter, ObjectStoreSim, SnapshotStore}

/** One-off HIGH-INTENSITY identity-ledger chaos shake (r16 verdict
  * item 3; the resident IdentityChaosSpec keeps suite time bounded):
  * runs [[IdentityChaosOps]] across seeds × both dml modes on all
  * three store personalities — POSIX, conditional-PUT osim, and
  * plain-PUT osim with the claim arbiter.
  *
  * Usage: Test/runMain graft.tools.IdentityChaosBlast [seeds] [threads] [ops]
  */
object IdentityChaosBlast {
  def main(args: Array[String]): Unit = {
    val seeds = args.headOption.map(_.toInt).getOrElse(3)
    val threads = if (args.length > 1) args(1).toInt else 6
    val ops = if (args.length > 2) args(2).toInt else 15
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.hadoopConfiguration.set(
      "fs.osim.impl", classOf[ObjectStoreSim].getName)

    def blast(label: String, warehouse: String, arbiter: Boolean,
              conditional: Boolean): Unit = {
      ObjectStoreSim.conditionalCreate = conditional
      SnapshotStore.manifestArbiter =
        if (arbiter) Some(new InMemoryClaimArbiter()) else None
      val cat = s"ib${label.filter(_.isLetter)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      try (0 until seeds).foreach { s =>
        Seq("cow", "delta").foreach { mode =>
          val t0 = System.nanoTime()
          val (landed, conflicted) = IdentityChaosOps.hunt(spark, cat, warehouse,
            s"ib$s$mode", seed = 6000 + s, nThreads = threads, opsPer = ops,
            info = _ => (), uniqueNames = arbiter, dmlMode = mode)
          println(f"[identity-blast] $label%-22s seed ${6000 + s} $mode%-5s " +
            f"${(System.nanoTime() - t0) / 1e9}%6.1fs  $landed landed, $conflicted conflicts  OK")
        }
      } finally {
        SnapshotStore.manifestArbiter = None
        ObjectStoreSim.reset()
      }
    }

    blast("posix", java.nio.file.Files
      .createTempDirectory("graft-iblast-posix").toString,
      arbiter = false, conditional = true)
    blast("osim-conditional", "osim://" + java.nio.file.Files
      .createTempDirectory("graft-iblast-osim").toString,
      arbiter = false, conditional = true)
    blast("osim-plainput-arb", "osim://" + java.nio.file.Files
      .createTempDirectory("graft-iblast-arb").toString,
      arbiter = true, conditional = false)
    println("[identity-blast] ALL GREEN")
    spark.stop()
  }
}
