package graft.connector

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec
import graft.store.SnapshotStore

/** The catalog/stream safety guards: drops refusing while clones
  * depend on the table, identifier parts staying inside the warehouse
  * root, and the change-feed source never offering an offset it could
  * not record.
  */
class CatalogRacesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-cr-$tag").toString

  private def catalog(warehouse: String): GraftCatalog = {
    val c = new GraftCatalog
    c.initialize("t", new CaseInsensitiveStringMap(
      java.util.Map.of("root", warehouse)))
    c
  }

  test("dropTable refuses while un-materialized clones reference the table") {
    val warehouse = tmpDir("dropguard")
    val cat = catalog(warehouse)
    val src = s"$warehouse/ns/src"
    SnapshotStore.init(spark, src,
      (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    val dst = s"$warehouse/ns/cl"
    SnapshotStore.cloneTable(spark, src, dst)

    val ident = Identifier.of(Array("ns"), "src")
    val e = intercept[IllegalArgumentException](cat.dropTable(ident))
    assert(e.getMessage.contains("clones"))
    assert(cat.tableExists(ident), "a refused drop must not delete anything")
    // the clone still reads through the source
    assert(SnapshotStore.read(spark, dst).count() == 20L)

    // materialize re-homes the clone and releases the hold — drop works
    SnapshotStore.materialize(spark, dst, Seq("k"))
    assert(cat.dropTable(ident))
    assert(!cat.tableExists(ident))
    assert(SnapshotStore.read(spark, dst).count() == 20L)
  }

  test("dropNamespace cascade: clones inside the subtree die with it, outside refuse it") {
    val warehouse = tmpDir("cascguard")
    val cat = catalog(warehouse)
    SnapshotStore.init(spark, s"$warehouse/a/src",
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"), Seq("k"), numBuckets = 2)

    // clone INSIDE the dropped namespace: cascade may take both
    SnapshotStore.cloneTable(spark, s"$warehouse/a/src", s"$warehouse/a/cl")
    // clone OUTSIDE: cascade must refuse (it would dangle)
    SnapshotStore.cloneTable(spark, s"$warehouse/a/src", s"$warehouse/b/cl")

    val e = intercept[IllegalArgumentException](
      cat.dropNamespace(Array("a"), true))
    assert(e.getMessage.contains("clones"))
    assert(cat.tableExists(Identifier.of(Array("a"), "src")))

    SnapshotStore.materialize(spark, s"$warehouse/b/cl", Seq("k"))
    assert(cat.dropNamespace(Array("a"), true))
    assert(!cat.tableExists(Identifier.of(Array("a"), "src")))
    assert(SnapshotStore.read(spark, s"$warehouse/b/cl").count() == 10L)
  }

  test("identifier parts cannot traverse out of the warehouse root") {
    val warehouse = tmpDir("traverse")
    val cat = catalog(warehouse)
    for (ident <- Seq(
        Identifier.of(Array(".."), "x"),
        Identifier.of(Array.empty[String], ".."),
        Identifier.of(Array("a/b"), "x"),
        Identifier.of(Array.empty[String], "a/../../x"),
        Identifier.of(Array("ns"), "x\\y")))
      intercept[IllegalArgumentException](cat.tableExists(ident))
    intercept[IllegalArgumentException](cat.listTables(Array("..")))
    intercept[IllegalArgumentException](cat.createNamespace(
      Array("..", "evil"), java.util.Collections.emptyMap()))
    intercept[IllegalArgumentException](cat.dropNamespace(Array(".."), true))
  }

  test("change-feed source offers nothing new when the offer cannot be persisted") {
    val root = tmpDir("offer")
    SnapshotStore.init(spark, root,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 1)
    (2L to 4L).foreach { k =>
      SnapshotStore.commitDelta(spark, root, Seq((k, "x")).toDF("k", "v"),
        Seq("k"), SnapshotStore.upsertMerge(Seq("k")))
    }

    val meta = tmpDir("offer-meta")
    // sabotage: a FILE where the offer-log DIRECTORY must go — every
    // persist attempt fails with an IOException until it is removed
    val offerDir = new Path(meta, "graft-offered")
    val fs = offerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(offerDir, false).close()

    val source = new GraftChangeFeedSource(spark, root, Seq("k"),
      consumerId = None, initialVersion = 0L,
      maxVersionsPerBatch = Some(1L), metadataPath = Some(meta))

    // table is at v3; cap base 0 → would offer 1, but the offer can't
    // be recorded → nothing new (NOT the uncapped 3 the old code gave)
    assert(source.getOffset.contains(LongOffset(0L)))
    assert(source.getOffset.contains(LongOffset(0L))) // stable, still failing

    // heal the log: offers resume, capped, one version at a time
    fs.delete(offerDir, false)
    assert(source.getOffset.contains(LongOffset(1L)))
    assert(source.getOffset.contains(LongOffset(2L)))
    assert(source.getOffset.contains(LongOffset(3L)))
    assert(source.getOffset.contains(LongOffset(3L))) // drained
  }
}
