package graft.tools

import org.apache.spark.sql.SparkSession

import graft.connector.{GraftCatalog, StreamWriteChaosOps}
import graft.store.{InMemoryClaimArbiter, ObjectStoreSim, SnapshotStore}

/** High-intensity sweep of the streaming WRITER chaos body
  * ([[StreamWriteChaosOps]]) across the three store personalities —
  * the write-side twin of [[StreamChaosBlast]].
  *
  * Usage: Test/runMain graft.tools.StreamWriteChaosBlast [seeds] [mutators] [ops]
  */
object StreamWriteChaosBlast {
  def main(args: Array[String]): Unit = {
    val seeds = args.headOption.map(_.toInt).getOrElse(4)
    val mutators = if (args.length > 1) args(1).toInt else 3
    val ops = if (args.length > 2) args(2).toInt else 10
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
      val cat = s"swb${label.filter(_.isLetter)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
      try (0 until seeds).foreach { s =>
        Seq("cow", "delta").foreach { mode =>
          val t0 = System.nanoTime()
          val (epochs, rows) = StreamWriteChaosOps.run(spark, cat, warehouse,
            s"s$s${if (mode == "delta") "d" else ""}", seed = 3000 + s,
            nMutators = mutators, opsPer = ops, dmlMode = mode)
          println(f"[swrite-blast] $label%-22s seed ${3000 + s} $mode%-5s " +
            f"${(System.nanoTime() - t0) / 1e9}%6.1fs  $epochs epochs, $rows rows  OK")
        }
      } finally {
        SnapshotStore.manifestArbiter = None
        ObjectStoreSim.reset()
      }
    }

    blast("posix", java.nio.file.Files
      .createTempDirectory("graft-swblast-posix").toString,
      arbiter = false, conditional = true)
    blast("osim-conditional", "osim://" + java.nio.file.Files
      .createTempDirectory("graft-swblast-osim").toString,
      arbiter = false, conditional = true)
    blast("osim-plainput-arb", "osim://" + java.nio.file.Files
      .createTempDirectory("graft-swblast-arb").toString,
      arbiter = true, conditional = false)
    println("[swrite-blast] ALL GREEN")
    spark.stop()
  }
}
