package graft.connector

import java.nio.file.Files

import graft.SparkSpec
import graft.store.ObjectStoreSim

/** Suite-resident streaming change-feed chaos (r14 verdict item #1 —
  * the one carried brief item): body in [[StreamChaosOps]], default
  * intensity (2 mutators × 10 ops), POSIX + conditional-PUT osim.
  * `graft.tools.StreamChaosBlast` shakes the same body at higher
  * intensity across more seeds and all three store personalities.
  *
  * This hunt found, on its FIRST run: the sourceSchema/createSource
  * two-instance schema re-resolution crash (engine-internal `Invalid
  * batch` assertion when a REPLACE lands between `load()` and
  * `start()` — fixed by the per-root schema pin) and the mid-swap
  * resolveSchema frankenschema (live `_schema` breadcrumb of the
  * DISPLACED epoch overlaid onto the new epoch's footers — fixed by
  * the epoch-stamp guard). Both now regression-pinned by these runs.
  */
class StreamChaosSpec extends SparkSpec {

  locally {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.osim.impl", classOf[ObjectStoreSim].getName)
  }

  test("streaming change-feed consumer converges under source chaos (POSIX)") {
    val warehouse = Files.createTempDirectory("graft-streamchaos").toString
    spark.conf.set("spark.sql.catalog.gscp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gscp.root", warehouse)
    StreamChaosOps.run(spark, "gscp", warehouse, "scp", seed = 15,
      info = info(_)): Unit
  }

  test("streaming change-feed consumer converges under source chaos (osim:// conditional-PUT)") {
    val warehouse =
      "osim://" + Files.createTempDirectory("graft-streamchaos-osim").toString
    spark.conf.set("spark.sql.catalog.gsco", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsco.root", warehouse)
    try StreamChaosOps.run(spark, "gsco", warehouse, "sco", seed = 16,
      info = info(_)): Unit
    finally ObjectStoreSim.reset()
  }
}
