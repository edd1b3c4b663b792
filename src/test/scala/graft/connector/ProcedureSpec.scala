package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** SQL-visible maintenance: compact / vacuum / restore / checkpoint
  * driven entirely from a SQL session via `CALL graft.system.<proc>`
  * — the reference schedules its maintenance as SQL procedures
  * (`with procedures/task_proc.sql:32-40`), so a SQL-only operator
  * must be able to run graft's without a library import.
  */
class ProcedureSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-proc").toString
  spark.conf.set("spark.sql.catalog.gproc", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gproc.root", warehouse)

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select("k", "v", "ts").as[(Long, String, Long)].collect().toSet

  private def call(sql: String): Seq[Long] =
    spark.sql(sql).collect().map(_.getAs[Any](0) match {
      case l: Long => l
      case i: Int  => i.toLong
    }).toSeq

  test("CALL system.compact defragments from SQL only; result row carries the version") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.m")
    spark.sql("""CREATE TABLE gproc.m.t (k BIGINT, v STRING, ts BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    // three commits → every bucket holds ≥3 files
    spark.sql("INSERT INTO gproc.m.t SELECT id, CAST(id AS STRING), id FROM range(0, 20)")
    spark.sql("INSERT INTO gproc.m.t SELECT id, CAST(id AS STRING), id FROM range(20, 40)")
    spark.sql("INSERT INTO gproc.m.t SELECT id, 'u', 99 FROM range(0, 5)")
    val before = rows(spark.table("gproc.m.t").toDF())
    assert(before.size == 40)

    val out = spark.sql("CALL gproc.system.compact(table => 'm.t')")
    assert(out.schema.fieldNames.toSeq == Seq("version"))
    val v = out.as[Long].head()
    assert(v == 4L) // v0 empty create + 3 inserts + the compaction commit
    // data bit-identical through the rewrite
    assert(rows(spark.table("gproc.m.t").toDF()) == before)
    // nothing left fragmented: a second CALL is a no-op at the same version
    assert(call("CALL gproc.system.compact(table => 'm.t')") == Seq(4L))
    // positional + extra knobs parse too
    assert(call("CALL gproc.system.compact('m.t', 2, '', 'ts')") == Seq(4L))
  }

  test("CALL system.checkpoint + vacuum + restore complete the SQL lifecycle") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.l")
    spark.sql("""CREATE TABLE gproc.l.t (k BIGINT, v STRING, ts BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gproc.l.t VALUES (1, 'a', 1), (2, 'b', 2)")
    spark.sql("INSERT INTO gproc.l.t VALUES (1, 'a2', 3)")

    // checkpoint the current version on demand
    assert(call("CALL gproc.system.checkpoint(table => 'l.t')") == Seq(2L))
    assert(new java.io.File(
      s"$warehouse/l/t/_commits/cp-${"%020d".format(2)}/_SUCCESS").exists())

    // restore to the pre-upsert state — a NEW version, history intact
    assert(call("CALL gproc.system.restore(table => 'l.t', version => 1)") == Seq(3L))
    assert(rows(spark.table("gproc.l.t").toDF()) ==
      Set((1L, "a", 1L), (2L, "b", 2L)))
    assert(rows(spark.sql("SELECT * FROM gproc.l.t VERSION AS OF 2")) ==
      Set((1L, "a2", 3L), (2L, "b", 2L)))

    // dry run first: reports the same count, touches NOTHING
    val wouldRemove = call(
      "CALL gproc.system.vacuum(table => 'l.t', keep_last => 1, dry_run => true)")
    assert(wouldRemove.head >= 1L)
    // v0 must still resolve after a dry run — nothing was deleted
    spark.sql("SELECT * FROM gproc.l.t VERSION AS OF 0").collect(): Unit
    // vacuum old versions away; current state survives, travel doesn't.
    // The real run may reclaim MORE than the dry report: the
    // retention-floor checkpoint block (skipped dry — it writes) also
    // retires superseded checkpoints below the floor.
    val removed = call("CALL gproc.system.vacuum(table => 'l.t', keep_last => 1)")
    assert(removed.head >= wouldRemove.head)
    assert(rows(spark.table("gproc.l.t").toDF()) ==
      Set((1L, "a", 1L), (2L, "b", 2L)))
    intercept[Exception](
      spark.sql("SELECT * FROM gproc.l.t VERSION AS OF 0").collect())
  }

  test("CALL validates its target like any table reference") {
    // unknown procedure → the catalog's own guidance, not a match error
    val e1 = intercept[Exception](
      spark.sql("CALL gproc.system.explode(table => 'm.t')").collect())
    // Spark wraps the catalog's IllegalArgumentException in
    // FAILED_TO_LOAD_ROUTINE; our guidance rides along as the cause
    assert(e1.getMessage.contains("FAILED_TO_LOAD_ROUTINE") &&
      Iterator.iterate(e1.getCause)(_.getCause).takeWhile(_ != null).take(5)
        .exists(_.getMessage.contains("unknown graft procedure")))
    // nonexistent table
    intercept[Exception](
      spark.sql("CALL gproc.system.compact(table => 'm.nope')").collect())
    // a table argument is identifier parts, not a path: traversal out of
    // the warehouse root is rejected before any FS access
    // '..' cannot even form a part ('.' is the separator → empty parts)
    val e3 = intercept[Exception](
      spark.sql("CALL gproc.system.compact(table => '../../etc')").collect())
    assert(e3.getMessage.contains("malformed table argument"))
    // and a separator-free traversal token hits the per-part validation
    val e4 = intercept[Exception](
      spark.sql("CALL gproc.system.compact(table => 'a/b')").collect())
    assert(e4.getMessage.contains("identifier part"))
    // procedures are listable for discovery
    val cat = new GraftCatalog
    cat.initialize("gp", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root", warehouse)))
    assert(cat.listProcedures(Array("system")).map(_.name()).toSet ==
      Set("compact", "vacuum", "restore", "checkpoint",
        "clone", "rebucket", "materialize", "detail", "history", "analyze",
        "branch", "publish_branch", "drop_branch", "branches",
        "tag", "drop_tag", "tags"))
  }

  test("CALL system.history lists retained versions with in-commit timestamps") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.his")
    spark.sql("""CREATE TABLE gproc.his.t (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gproc.his.t SELECT id, CAST(id AS STRING) FROM range(0, 10)")
    spark.sql("DELETE FROM gproc.his.t WHERE k = 3")
    val his = spark.sql("CALL gproc.system.history(table => 'his.t')")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getBoolean(2)))
    // CREATE (v0) + INSERT + DELETE = three versions, newest last and
    // marked current; timestamps monotone non-decreasing
    assert(his.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(his.map(_._3).toSeq == Seq(false, false, true))
    assert(his.sliding(2).forall { case Array(a, b) => !a._2.after(b._2); case _ => true })
    // what history reports is exactly what time travel resolves: the
    // middle version's timestamp reads back the pre-DELETE state
    val t1 = his(1)._2.getTime
    val root = s"$warehouse/his/t"
    assert(spark.read.format("graft").option("timestampAsOf", t1.toString)
      .load(root).count() == 10)
    // vacuum prunes history; the report follows
    spark.sql("CALL gproc.system.vacuum(table => 'his.t', keep_last => 1)")
    val his2 = spark.sql("CALL gproc.system.history(table => 'his.t')")
      .collect().map(_.getLong(0))
    // manifests-only pruning (the DELETE's dirs live on under v2):
    // no serialization commit needed, history simply shrinks
    assert(his2.toSeq == Seq(2L))
  }

  test("SQL TRUNCATE TABLE empties a graft table as one version") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.trn")
    spark.sql("""CREATE TABLE gproc.trn.t (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gproc.trn.t SELECT id, CAST(id AS STRING) FROM range(0, 10)")
    spark.sql("TRUNCATE TABLE gproc.trn.t")
    assert(spark.table("gproc.trn.t").count() == 0)
    // one version, time travel still sees the old rows
    val root = s"$warehouse/trn/t"
    val latest = graft.store.SnapshotStore.latestVersion(spark, root).get
    assert(spark.read.format("graft").option("versionAsOf", latest - 1)
      .load(root).count() == 10)
    // and the table remains writable after truncation
    spark.sql("INSERT INTO gproc.trn.t VALUES (1, 'back')")
    assert(spark.table("gproc.trn.t").count() == 1)
  }

  test("DELETE every row then CALL compact: the empty table still answers projections") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.emp")
    spark.sql("""CREATE TABLE gproc.emp.t (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gproc.emp.t SELECT id, CAST(id AS STRING) FROM range(0, 20)")
    spark.sql("DELETE FROM gproc.emp.t WHERE k >= 0")
    // the fold empties EVERY bucket — the attempt dir holds only _SUCCESS
    spark.sql("CALL gproc.system.compact(table => 'emp.t')")
    val m = graft.store.SnapshotStore.readManifest(spark, s"$warehouse/emp/t",
      graft.store.SnapshotStore.latestVersion(spark, s"$warehouse/emp/t").get)
    assert(m.buckets.isEmpty, "all-empty fold must drop every bucket")
    // legal SQL on the empty table: projection, count, and the path API
    assert(spark.sql("SELECT k FROM gproc.emp.t").count() == 0)
    assert(spark.table("gproc.emp.t").columns.toSeq == Seq("k", "v"))
    val direct = graft.store.SnapshotStore.read(spark, s"$warehouse/emp/t")
    assert(direct.columns.toSeq == Seq("k", "v") && direct.count() == 0)
    // and the table stays writable
    spark.sql("INSERT INTO gproc.emp.t VALUES (7, 'back')")
    assert(spark.table("gproc.emp.t").count() == 1)
  }

  test("CALL system.detail reports per-bucket layout, rows, and tombstone debt") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.det")
    spark.sql("""CREATE TABLE gproc.det.t (k BIGINT, v STRING, ts BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gproc.det.t SELECT id, CAST(id AS STRING), id FROM range(0, 20)")
    spark.sql("INSERT INTO gproc.det.t SELECT id, CAST(id AS STRING), id FROM range(20, 40)")
    spark.sql("DELETE FROM gproc.det.t WHERE k = 1") // tombstone sidecar
    val det = spark.sql("CALL gproc.system.detail(table => 'det.t')")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4), r.getLong(5)))
    assert(det.map(_._1).toSeq == Seq(0, 1))
    // two un-compacted inserts → ≥2 files per bucket, bytes positive
    assert(det.forall(d => d._2 >= 2 && d._3 > 0))
    // recorded physical rows sum to 40 (the tombstoned row still counts
    // physically until folded)
    assert(det.map(_._4).sum == 40)
    // exactly one bucket carries the delete's sidecar, with real bytes
    assert(det.count(d => d._5 > 0 && d._6 > 0) == 1)
    // compaction folds the debt; detail reflects it
    spark.sql("CALL gproc.system.compact(table => 'det.t')")
    val det2 = spark.sql("CALL gproc.system.detail(table => 'det.t')")
      .collect().map(r => (r.getInt(1), r.getInt(4)))
    assert(det2.forall { case (files, tombs) => files == 1 && tombs == 0 })
  }

  test("CALL system.clone / materialize / rebucket complete the layout lifecycle from SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.lay")
    spark.sql("""CREATE TABLE gproc.lay.src (k BIGINT, v STRING, ts BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gproc.lay.src SELECT id, CAST(id AS STRING), id FROM range(0, 40)")
    val srcRows = rows(spark.table("gproc.lay.src").toDF())

    // zero-copy clone: target readable immediately, no local data files
    assert(call("CALL gproc.system.clone(table => 'lay.src', target => 'lay.c1')") == Seq(0L))
    assert(rows(spark.table("gproc.lay.c1").toDF()) == srcRows)
    // the clone diverges independently of the source
    spark.sql("INSERT INTO gproc.lay.c1 VALUES (100, 'clone-only', 1)")
    assert(spark.table("gproc.lay.c1").count() == 41)
    assert(rows(spark.table("gproc.lay.src").toDF()) == srcRows)

    // materialize re-homes the clone; the source can then be dropped
    call("CALL gproc.system.materialize(table => 'lay.c1')")
    spark.sql("DROP TABLE gproc.lay.src")
    assert(spark.table("gproc.lay.c1").count() == 41)

    // rebucket: new layout, identical rows, future writes compose
    call("CALL gproc.system.rebucket(table => 'lay.c1', num_buckets => 5)")
    val m = graft.store.SnapshotStore.readManifest(spark, s"$warehouse/lay/c1",
      graft.store.SnapshotStore.latestVersion(spark, s"$warehouse/lay/c1").get)
    assert(m.numBuckets == 5)
    assert(spark.table("gproc.lay.c1").count() == 41)
    spark.sql("INSERT INTO gproc.lay.c1 VALUES (200, 'post-rebucket', 2)")
    assert(spark.table("gproc.lay.c1").count() == 42)

    // clone target validation: existing target and missing namespace refuse
    val e1 = intercept[Exception](
      call("CALL gproc.system.clone(table => 'lay.c1', target => 'lay.c1')"))
    assert(e1.getMessage.contains("already exists"))
    val e2 = intercept[Exception](
      call("CALL gproc.system.clone(table => 'lay.c1', target => 'nope.c2')"))
    assert(e2.getMessage.contains("does not exist"))
  }
}
