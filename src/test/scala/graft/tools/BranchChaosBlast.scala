package graft.tools

import org.apache.spark.sql.SparkSession

import graft.connector.{BranchChaosOps, GraftCatalog}
import graft.store.{InMemoryClaimArbiter, ObjectStoreSim, SnapshotStore}

/** One-off HIGH-INTENSITY branch-interior chaos shake (not
  * suite-resident — the resident BranchChaosSpec keeps suite time
  * bounded): runs [[BranchChaosOps]] at 6 threads × 15 ops across
  * several seeds on all three store personalities — POSIX,
  * conditional-PUT osim, and plain-PUT osim with the claim arbiter.
  *
  * Usage: Test/runMain graft.tools.BranchChaosBlast [seeds] [threads] [ops]
  */
object BranchChaosBlast {
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
      val cat = s"bb${label.filter(_.isLetter)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      try (0 until seeds).foreach { s =>
        val t0 = System.nanoTime()
        val (landed, conflicted) = BranchChaosOps.hunt(spark, cat, warehouse,
          s"bb$s", seed = 4000 + s, nThreads = threads, opsPer = ops,
          info = _ => (), uniqueNames = arbiter)
        println(f"[branch-blast] $label%-22s seed ${4000 + s} " +
          f"${(System.nanoTime() - t0) / 1e9}%6.1fs  $landed landed, $conflicted conflicts  OK")
      } finally {
        SnapshotStore.manifestArbiter = None
        ObjectStoreSim.reset()
      }
    }

    blast("posix", java.nio.file.Files
      .createTempDirectory("graft-bblast-posix").toString,
      arbiter = false, conditional = true)
    blast("osim-conditional", "osim://" + java.nio.file.Files
      .createTempDirectory("graft-bblast-osim").toString,
      arbiter = false, conditional = true)
    blast("osim-plainput-arb", "osim://" + java.nio.file.Files
      .createTempDirectory("graft-bblast-arb").toString,
      arbiter = true, conditional = false)
    println("[branch-blast] ALL GREEN")
    spark.stop()
  }
}
