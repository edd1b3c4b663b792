package graft.tools

import org.apache.spark.sql.SparkSession

import graft.connector.{ChaosOps, GraftCatalog}
import graft.store.{InMemoryClaimArbiter, ObjectStoreSim, SnapshotStore}

/** One-off HIGH-INTENSITY chaos shake (not suite-resident — the
  * resident ChaosHuntSpec keeps suite time bounded at 4×(4×10)): runs
  * the shared contract-op mix at 6 threads × 15 ops across several
  * seeds on all three store personalities — POSIX, conditional-PUT
  * osim, and plain-PUT osim with the claim arbiter. A failure here is
  * a real race to fix and pin; green runs are round-end confidence.
  *
  * Usage: Test/runMain graft.tools.ChaosBlast [seeds] [threads] [ops]
  */
object ChaosBlast {
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
      val cat = s"cb${label.filter(_.isLetter)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      try (0 until seeds).foreach { s =>
        Seq("cow", "delta").foreach { mode =>
          val t0 = System.nanoTime()
          val (landed, conflicted) = ChaosOps.hunt(spark, cat, warehouse,
            s"b$s${if (mode == "delta") "d" else ""}", seed = 1000 + s,
            nThreads = threads, opsPer = ops, info = _ => (), dmlMode = mode)
          println(f"[blast] $label%-22s seed ${1000 + s} $mode%-5s " +
            f"${(System.nanoTime() - t0) / 1e9}%6.1fs  $landed landed, $conflicted conflicts  OK")
        }
      } finally {
        SnapshotStore.manifestArbiter = None
        ObjectStoreSim.reset()
      }
    }

    blast("posix", java.nio.file.Files
      .createTempDirectory("graft-blast-posix").toString,
      arbiter = false, conditional = true)
    blast("osim-conditional", "osim://" + java.nio.file.Files
      .createTempDirectory("graft-blast-osim").toString,
      arbiter = false, conditional = true)
    blast("osim-plainput-arb", "osim://" + java.nio.file.Files
      .createTempDirectory("graft-blast-arb").toString,
      arbiter = true, conditional = false)
    println("[blast] ALL GREEN")
    spark.stop()
  }
}
