package graft.connector

import java.nio.file.Files

import graft.SparkSpec
import graft.store.ObjectStoreSim

/** Suite-resident branch-interior chaos (r15 verdict item #1): body in
  * [[BranchChaosOps]] — the full contract-op vocabulary run INSIDE a
  * long-lived write-audit-publish branch while main mutates underneath
  * and publishes race branch-side commits. Default intensity here
  * (4 threads × 10 ops, POSIX + conditional-PUT osim) keeps suite time
  * bounded; `graft.tools.BranchChaosBlast` shakes the same body at
  * higher intensity across more seeds and all three store
  * personalities.
  */
class BranchChaosSpec extends SparkSpec {

  locally {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.osim.impl", classOf[ObjectStoreSim].getName)
  }

  (1 to 2).foreach { round =>
    test(s"branch-interior chaos hunt round $round (POSIX, 4 threads x 10 ops)") {
      val warehouse = Files.createTempDirectory(s"graft-branchchaos$round").toString
      val cat = s"gbc$round"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      BranchChaosOps.hunt(spark, cat, warehouse, s"bh$round", seed = 40 + round,
        nThreads = 4, opsPer = 10, info = info(_)): Unit
    }
  }

  test("branch-interior chaos hunt (osim:// conditional-PUT)") {
    val warehouse =
      "osim://" + Files.createTempDirectory("graft-branchchaos-osim").toString
    val cat = "gbco"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    try BranchChaosOps.hunt(spark, cat, warehouse, "bho", seed = 47,
      nThreads = 4, opsPer = 10, info = info(_)): Unit
    finally ObjectStoreSim.reset()
  }
}
