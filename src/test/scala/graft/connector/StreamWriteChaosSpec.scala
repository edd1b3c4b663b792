package graft.connector

import java.nio.file.Files

import graft.SparkSpec
import graft.store.{ObjectStoreSim, SnapshotStore}

/** Suite-resident round of [[StreamWriteChaosOps]] (default intensity;
  * `graft.tools.StreamWriteChaosBlast` runs the high-intensity sweeps
  * across all three store personalities): a live `writeStream.toTable`
  * upsert writer races compact / checkpoint / vacuum / rebucket /
  * clone on the same table — exactly-once must hold through every
  * documented OCC loss and through vacuum's floor-advance
  * serialization commits landing between the writer's own versions.
  */
class StreamWriteChaosSpec extends SparkSpec {

  test("toTable writer converges exactly-once under maintenance chaos (POSIX)") {
    val warehouse = Files.createTempDirectory("graft-swchaos-wh").toString
    spark.conf.set("spark.sql.catalog.swc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.swc.root", warehouse)
    StreamWriteChaosOps.run(spark, "swc", warehouse, "w1", seed = 11,
      nMutators = 2, opsPer = 6, info = info(_)): Unit
  }

  test("toTable writer converges exactly-once under maintenance chaos (dml.mode=delta)") {
    // the delta personality (r15 verdict item #2): the mutators' no-op
    // row-level UPDATEs take the O(changed-rows) WriteDelta path with
    // runtime bucket narrowing while the stream writer commits epochs
    val warehouse = Files.createTempDirectory("graft-swchaos-dwh").toString
    spark.conf.set("spark.sql.catalog.swcd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.swcd.root", warehouse)
    StreamWriteChaosOps.run(spark, "swcd", warehouse, "wd", seed = 13,
      nMutators = 2, opsPer = 6, info = info(_), dmlMode = "delta"): Unit
  }

  test("toTable writer converges exactly-once under maintenance chaos (osim conditional-PUT)") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.osim.impl", classOf[ObjectStoreSim].getName)
    ObjectStoreSim.conditionalCreate = true
    val warehouse = "osim://" +
      Files.createTempDirectory("graft-swchaos-osim").toString
    spark.conf.set("spark.sql.catalog.swco", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.swco.root", warehouse)
    try StreamWriteChaosOps.run(spark, "swco", warehouse, "w2", seed = 12,
      nMutators = 2, opsPer = 6, info = info(_)): Unit
    finally ObjectStoreSim.reset()
  }
}
