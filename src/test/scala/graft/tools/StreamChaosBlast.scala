package graft.tools

import org.apache.spark.sql.SparkSession

import graft.connector.{GraftCatalog, StreamChaosOps}
import graft.store.{InMemoryClaimArbiter, ObjectStoreSim, SnapshotStore}

/** One-off HIGH-INTENSITY streaming change-feed chaos shake (not
  * suite-resident — the resident StreamChaosSpec keeps suite time
  * bounded at 2 rounds of 2×10): runs the shared consumer-vs-mutators
  * mix at higher op counts across several seeds on all three store
  * personalities — POSIX, conditional-PUT osim, and plain-PUT osim
  * with the claim arbiter. A failure persists its journal to
  * `target/chaos-diag/` (path in the message); a green sweep is
  * round-end confidence on the streaming source's offset/retention/
  * refresh protocols.
  *
  * Usage: Test/runMain graft.tools.StreamChaosBlast [seeds] [mutators] [ops]
  */
object StreamChaosBlast {
  def main(args: Array[String]): Unit = {
    val seeds = args.headOption.map(_.toInt).getOrElse(4)
    val mutators = if (args.length > 1) args(1).toInt else 3
    val ops = if (args.length > 2) args(2).toInt else 12
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
      val cat = s"scb${label.filter(_.isLetter)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
      try (0 until seeds).foreach { s =>
        val t0 = System.nanoTime()
        val (batches, rows) = StreamChaosOps.run(spark, cat, warehouse,
          s"s$s", seed = 2000 + s, nMutators = mutators, opsPer = ops)
        println(f"[stream-blast] $label%-22s seed ${2000 + s} " +
          f"${(System.nanoTime() - t0) / 1e9}%6.1fs  $batches batches, $rows change rows  OK")
      } finally {
        SnapshotStore.manifestArbiter = None
        ObjectStoreSim.reset()
      }
    }

    blast("posix", java.nio.file.Files
      .createTempDirectory("graft-sblast-posix").toString,
      arbiter = false, conditional = true)
    blast("osim-conditional", "osim://" + java.nio.file.Files
      .createTempDirectory("graft-sblast-osim").toString,
      arbiter = false, conditional = true)
    blast("osim-plainput-arb", "osim://" + java.nio.file.Files
      .createTempDirectory("graft-sblast-arb").toString,
      arbiter = true, conditional = false)
    println("[stream-blast] ALL GREEN")
    spark.stop()
  }
}
