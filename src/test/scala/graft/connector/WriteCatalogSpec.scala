package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.SnapshotStore

/** Write-side connector + catalog: any Spark job can create, upsert,
  * overwrite, stream into, and name-address graft tables.
  */
class WriteCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-wc-$tag").toString

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select("k", "v", "ts").as[(Long, String, Long)].collect().toSet

  test("df.write.format(graft): create, keyed-upsert append, overwrite, create modes") {
    val root = tmpDir("write")
    val v0 = (1L to 30L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    v0.write.format("graft").option("keys", "k").option("numBuckets", "4")
      .option("statsCols", "ts").save(root)
    assert(rows(SnapshotStore.read(spark, root)) == rows(v0))

    // append = keyed upsert: k=1 replaces, k=31 inserts
    Seq((1L, "x", 100L), (31L, "new", 100L)).toDF("k", "v", "ts")
      .write.format("graft").option("keys", "k").mode("append").save(root)
    val now = rows(SnapshotStore.read(spark, root))
    assert(now((1L, "x", 100L)) && now((31L, "new", 100L)) && now.size == 31)

    // overwrite = full replace, previous versions still travelable
    Seq((7L, "only", 1L)).toDF("k", "v", "ts")
      .write.format("graft").option("keys", "k").mode("overwrite").save(root)
    assert(rows(SnapshotStore.read(spark, root)) == Set((7L, "only", 1L)))
    assert(rows(SnapshotStore.readVersion(spark, root, 1L)) == now)

    // the round trip composes with the read connector + pushdown
    assert(spark.read.format("graft").load(root).where(col("ts") <= 5L)
      .count() == 1L)

    intercept[IllegalStateException] {
      v0.write.format("graft").option("keys", "k").mode("errorifexists").save(root)
    }
    v0.write.format("graft").option("keys", "k").mode("ignore").save(root) // no-op
    assert(rows(SnapshotStore.read(spark, root)) == Set((7L, "only", 1L)))

    // keys are persisted in the manifest (format 4): a keys-LESS append
    // inherits them (the SQL INSERT INTO path has no options channel)
    Seq((8L, "inherited", 2L)).toDF("k", "v", "ts")
      .write.format("graft").mode("append").save(root)
    assert(rows(SnapshotStore.read(spark, root))((8L, "inherited", 2L)))
    // ... while an append declaring DIFFERENT keys fails fast: the
    // merge identity fixes the bucket layout at creation
    val e = intercept[IllegalArgumentException](
      Seq((9L, "bad", 3L)).toDF("k", "v", "ts")
        .write.format("graft").option("keys", "v").mode("append").save(root))
    assert(e.getMessage.contains("created with keys"))
    // creation without keys still fails with guidance, not a downstream NPE
    val e2 = intercept[Exception](
      v0.write.format("graft").mode("append").save(tmpDir("nokeys")))
    assert(e2.getMessage.contains("keys"))
  }

  test("writeStream.format(graft): exactly-once streaming upserts") {
    val root = tmpDir("sink")
    val ckpt = tmpDir("sink-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("k", "v", "ts")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("path", root)
      .option("keys", "k").option("numBuckets", "4")
      .start()
    mem.addData((1L, "a", 1L), (2L, "b", 1L))
    q.processAllAvailable()
    mem.addData((1L, "a2", 2L), (3L, "c", 2L))
    q.processAllAvailable()
    q.stop()
    assert(rows(SnapshotStore.read(spark, root)) ==
      Set((1L, "a2", 2L), (2L, "b", 1L), (3L, "c", 2L)))

    // redelivered batch id = manifest-txn no-op (the exactly-once hinge)
    val sink = new GraftSink(spark, Map("path" -> root, "keys" -> "k",
      "checkpointLocation" -> ckpt))
    val vBefore = SnapshotStore.latestVersion(spark, root).get
    sink.addBatch(0, Seq((1L, "REPLAYED", 9L)).toDF("k", "v", "ts"))
    assert(SnapshotStore.latestVersion(spark, root).get == vBefore)
    assert(!rows(SnapshotStore.read(spark, root)).exists(_._2 == "REPLAYED"))
    // a genuinely new batch applies
    sink.addBatch(99, Seq((4L, "d", 3L)).toDF("k", "v", "ts"))
    assert(rows(SnapshotStore.read(spark, root))((4L, "d", 3L)))
  }

  test("GraftCatalog: name-first SQL, VERSION AS OF time travel, listing, drop") {
    val warehouse = tmpDir("cat")
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.root", warehouse)

    val t1 = s"$warehouse/sales/orders"
    val v0 = (1L to 20L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts")
    SnapshotStore.init(spark, t1, v0, Seq("k"), numBuckets = 4)
    SnapshotStore.commitDelta(spark, t1,
      Seq((1L, "x", 100L)).toDF("k", "v", "ts"), Seq("k"),
      SnapshotStore.upsertMerge(Seq("k")))

    assert(spark.sql("SELECT count(*) FROM gcat.sales.orders").as[Long].head() == 20L)
    assert(spark.sql(
      "SELECT v FROM gcat.sales.orders VERSION AS OF 0 WHERE k = 1").as[String].head() == "v1")
    assert(spark.sql(
      "SELECT v FROM gcat.sales.orders VERSION AS OF 1 WHERE k = 1").as[String].head() == "x")
    // predicates over the catalog table reach the same pruned scan
    // (k=1's ts moved to 100 in the upsert, so only k=2,3 remain ≤ 3)
    assert(spark.sql(
      "SELECT count(*) FROM gcat.sales.orders WHERE ts <= 3").as[Long].head() == 2L)

    val listed = spark.sql("SHOW TABLES IN gcat.sales").collect().map(_.getString(1)).toSet
    assert(listed == Set("orders"))
    assert(spark.sql("SHOW NAMESPACES IN gcat").collect().map(_.getString(0)).toSet
      == Set("sales"))

    // creation without the merge identity is refused with guidance
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE gcat.sales.t2 (a INT) USING graft"))
    assert(e.getMessage.contains("keys"))

    spark.sql("DROP TABLE gcat.sales.orders")
    assert(spark.sql("SHOW TABLES IN gcat.sales").isEmpty)
    intercept[Exception](spark.sql("SELECT * FROM gcat.sales.orders").collect())
  }

  test("SQL DML through the catalog: CREATE TABLE, INSERT INTO upserts, INSERT OVERWRITE, CTAS") {
    val warehouse = tmpDir("dml")
    spark.conf.set("spark.sql.catalog.gdml", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdml.root", warehouse)
    spark.sql("CREATE NAMESPACE gdml.sales")

    // CREATE TABLE: empty, keys persisted, schema readable pre-data
    spark.sql("""CREATE TABLE gdml.sales.orders (k BIGINT, v STRING, ts BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='4')""")
    assert(spark.sql("SELECT * FROM gdml.sales.orders").isEmpty)
    assert(spark.table("gdml.sales.orders").schema.fieldNames.toSeq ==
      Seq("k", "v", "ts"))
    // keys are required and validated against the schema
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE gdml.sales.nokeys (a INT) USING graft"))
    assert(e1.getMessage.contains("keys"))
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE gdml.sales.badkey (a INT) USING graft TBLPROPERTIES ('keys'='zz')"))
    assert(e2.getMessage.contains("zz"))

    // INSERT INTO = keyed upsert (graft is a keyed table format)
    spark.sql("INSERT INTO gdml.sales.orders VALUES (1, 'a', 10), (2, 'b', 20)")
    spark.sql("INSERT INTO gdml.sales.orders VALUES (1, 'a2', 30), (3, 'c', 30)")
    assert(rows(spark.table("gdml.sales.orders").toDF()) ==
      Set((1L, "a2", 30L), (2L, "b", 20L), (3L, "c", 30L)))
    // history: each INSERT is one commit above the empty v0
    assert(rows(spark.sql("SELECT * FROM gdml.sales.orders VERSION AS OF 1")) ==
      Set((1L, "a", 10L), (2L, "b", 20L)))

    // INSERT OVERWRITE replaces the state as one new version
    spark.sql("INSERT OVERWRITE gdml.sales.orders VALUES (9, 'z', 90)")
    assert(rows(spark.table("gdml.sales.orders").toDF()) == Set((9L, "z", 90L)))
    assert(rows(spark.sql("SELECT * FROM gdml.sales.orders VERSION AS OF 2"))
      .size == 3)

    // CTAS: schema + data from the query, keys from properties
    spark.sql("""CREATE TABLE gdml.sales.big USING graft
                 TBLPROPERTIES ('keys'='k', 'numBuckets'='2')
                 AS SELECT id AS k, CAST(id AS STRING) AS v, id AS ts
                    FROM range(1, 21)""")
    assert(spark.sql("SELECT count(*) FROM gdml.sales.big").as[Long].head() == 20L)
    // ... and the created table is an ordinary graft table: upsertable,
    // time-travelable, prunable
    spark.sql("INSERT INTO gdml.sales.big VALUES (1, 'x', 100)")
    assert(spark.sql("SELECT v FROM gdml.sales.big WHERE k = 1").as[String].head() == "x")
    assert(spark.sql("SELECT count(*) FROM gdml.sales.big").as[Long].head() == 20L)

    // writeTo API lands in the same path
    Seq((21L, "w", 1L)).toDF("k", "v", "ts").writeTo("gdml.sales.big").append()
    assert(spark.sql("SELECT count(*) FROM gdml.sales.big").as[Long].head() == 21L)

    // a time-travel relation refuses writes
    val e3 = intercept[Exception](spark.sql(
      "INSERT INTO gdml.sales.big VERSION AS OF 0 VALUES (5, 'n', 5)"))
    assert(e3.getMessage.toLowerCase.contains("time") ||
      e3.getMessage.contains("VERSION"))
  }

  test("GraftCatalog: TIMESTAMP AS OF resolves by commit instant; rename moves a table whole") {
    val warehouse = tmpDir("cat2")
    spark.conf.set("spark.sql.catalog.gcat2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat2.root", warehouse)
    val t = s"$warehouse/t"
    SnapshotStore.init(spark, t,
      (1L to 10L).map(k => (k, s"v$k", k)).toDF("k", "v", "ts"), Seq("k"), numBuckets = 2)
    Thread.sleep(1100) // commit instants must straddle a wall-clock gap
    val betweenCommits = java.sql.Timestamp.from(java.time.Instant.now())
    Thread.sleep(1100)
    SnapshotStore.commitDelta(spark, t,
      Seq((1L, "x", 100L)).toDF("k", "v", "ts"), Seq("k"),
      SnapshotStore.upsertMerge(Seq("k")))

    // between the two commits → version 0's state
    assert(spark.sql(
      s"SELECT v FROM gcat2.t TIMESTAMP AS OF '$betweenCommits' WHERE k = 1")
      .as[String].head() == "v1")
    // after the latest commit → current state
    val now = java.sql.Timestamp.from(java.time.Instant.now())
    assert(spark.sql(
      s"SELECT v FROM gcat2.t TIMESTAMP AS OF '$now' WHERE k = 1")
      .as[String].head() == "x")
    // before the table existed → no version qualifies
    intercept[Exception](spark.sql(
      "SELECT * FROM gcat2.t TIMESTAMP AS OF '2000-01-01 00:00:00'").collect())

    // rename: the whole history moves (manifests are root-relative)
    spark.sql("ALTER TABLE gcat2.t RENAME TO t2")
    assert(spark.sql("SELECT count(*) FROM gcat2.t2").as[Long].head() == 10L)
    assert(spark.sql("SELECT v FROM gcat2.t2 VERSION AS OF 0 WHERE k = 1")
      .as[String].head() == "v1")
    intercept[Exception](spark.sql("SELECT * FROM gcat2.t").collect())
  }
}
