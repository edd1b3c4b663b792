package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.store.SnapshotStore

/** `df.writeStream.toTable("cat.ns.t")` — the V2 streaming write
  * against a CATALOGED graft table: per-epoch exactly-once keyed
  * upserts with the txn keyed by the streaming query id, so restarts
  * and redeliveries are no-ops, and the same table stays readable by
  * name between epochs.
  */
class StreamTableWriteSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-stw-wh").toString
  locally {
    spark.conf.set("spark.sql.catalog.stw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.stw.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS stw.ns")
  }

  private def state(name: String): Set[(Long, String)] =
    spark.table(name).as[(Long, String)].collect().toSet

  test("writeStream.toTable upserts each epoch exactly once") {
    spark.sql("""CREATE TABLE stw.ns.t (k BIGINT, v STRING)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    val ckpt = Files.createTempDirectory("graft-stw-ck").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]

    def run(): Unit = {
      val q = in.toDF().toDF("k", "v")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("stw.ns.t")
      q.awaitTermination()
    }

    in.addData((1L, "a"), (2L, "b"))
    run()
    assert(state("stw.ns.t") == Set((1L, "a"), (2L, "b")))

    // second epoch: update key 1, insert key 3 — keyed upsert semantics
    in.addData((1L, "a2"), (3L, "c"))
    run()
    assert(state("stw.ns.t") == Set((1L, "a2"), (2L, "b"), (3L, "c")))

    // the table's version history advanced one commit per epoch, each
    // carrying the stream's txn mark — a replayed epoch would be
    // suppressed by the high-water check
    val root = s"$warehouse/ns/t"
    val versions = SnapshotStore.versions(spark, root)
    assert(versions.size == 3) // CREATE + two epochs

    // restart from the same checkpoint with no new data: no new commit
    run()
    assert(SnapshotStore.versions(spark, root).size == 3)
    assert(state("stw.ns.t") == Set((1L, "a2"), (2L, "b"), (3L, "c")))
  }

  test("streaming into a missing table refuses with CREATE guidance") {
    val ckpt = Files.createTempDirectory("graft-stw-ck2").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"))
    val e = intercept[Exception] {
      val q = in.toDF().toDF("k", "v")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("stw.ns.missing")
      q.awaitTermination()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("CREATE TABLE") || msgs.contains("TABLE_OR_VIEW_NOT_FOUND")
      || msgs.toLowerCase.contains("not found"), msgs)
  }
}
