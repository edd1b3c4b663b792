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

  // round 1 = cow, round 2 = the COMPOSED delta-mode branch table (r16
  // verdict item 2: WriteDelta staging + runtime filters INSIDE the
  // fork racing publish/re-fork/branch-REPLACE/vacuum)
  Seq(1 -> "cow", 2 -> "delta").foreach { case (round, mode) =>
    test(s"branch-interior chaos hunt round $round ($mode, POSIX, 4 threads x 10 ops)") {
      val warehouse = Files.createTempDirectory(s"graft-branchchaos$round").toString
      val cat = s"gbc$round"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      BranchChaosOps.hunt(spark, cat, warehouse, s"bh$round", seed = 40 + round,
        nThreads = 4, opsPer = 10, info = info(_), dmlMode = mode): Unit
    }
  }

  Seq("cow", "delta").foreach { mode =>
    test(s"branch-interior chaos hunt (osim:// conditional-PUT, $mode)") {
      val warehouse =
        "osim://" + Files.createTempDirectory(s"graft-branchchaos-osim-$mode").toString
      val cat = s"gbco${mode.head}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      try BranchChaosOps.hunt(spark, cat, warehouse, s"bho${mode.head}",
        seed = if (mode == "cow") 47 else 48,
        nThreads = 4, opsPer = 10, info = info(_), dmlMode = mode): Unit
      finally ObjectStoreSim.reset()
    }
  }
}
