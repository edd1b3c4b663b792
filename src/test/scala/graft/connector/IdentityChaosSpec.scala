package graft.connector

import java.nio.file.Files

import graft.SparkSpec
import graft.store.ObjectStoreSim

/** Suite-resident identity-ledger chaos (r16 verdict item 3): body in
  * [[IdentityChaosOps]] — concurrent identity minting on main AND a
  * long-lived branch (cloned ledger!) under publish / re-fork /
  * restore / vacuum churn, both dml modes. Default intensity keeps
  * suite time bounded; `graft.tools.IdentityChaosBlast` shakes the
  * same body harder across all three store personalities.
  */
class IdentityChaosSpec extends SparkSpec {

  locally {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.osim.impl", classOf[ObjectStoreSim].getName)
  }

  Seq("cow", "delta").foreach { mode =>
    test(s"identity-ledger chaos hunt ($mode, POSIX, 4 threads x 10 ops)") {
      val warehouse =
        Files.createTempDirectory(s"graft-idchaos-$mode").toString
      val cat = s"gic${mode.head}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      IdentityChaosOps.hunt(spark, cat, warehouse, s"ih${mode.head}",
        seed = if (mode == "cow") 60 else 61,
        nThreads = 4, opsPer = 10, info = info(_), dmlMode = mode): Unit
    }
  }

  test("identity-ledger chaos hunt (osim:// conditional-PUT)") {
    val warehouse =
      "osim://" + Files.createTempDirectory("graft-idchaos-osim").toString
    val cat = "gico"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    try IdentityChaosOps.hunt(spark, cat, warehouse, "iho", seed = 62,
      nThreads = 4, opsPer = 10, info = info(_)): Unit
    finally ObjectStoreSim.reset()
  }
}
