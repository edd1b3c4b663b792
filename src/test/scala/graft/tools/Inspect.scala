package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.store.{ChangeFeed, SnapshotStore}

/** Chaos-forensics REPL-substitute: dump one key's value across every
  * retained version of a graft table, plus the change-feed rows that
  * mention it — the questions every convergence-divergence diagnosis
  * starts with.
  *
  * Usage: Test/runMain graft.tools.Inspect <root> <keyCol> <keyValue> [feedFrom]
  */
object Inspect {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val keyCol = if (args.length > 1) args(1) else "k"
    val keyVal = if (args.length > 2) args(2).toLong else 0L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vs = SnapshotStore.versions(spark, root)
    println(s"versions: $vs")
    println(s"props: ${SnapshotStore.readProps(spark, root)}")
    vs.foreach { v =>
      val m = SnapshotStore.readManifest(spark, root, v)
      val rows =
        try SnapshotStore.readVersion(spark, root, v)
          .where(col(keyCol) === keyVal).collect().toSeq
        catch { case e: Throwable => Seq(s"<read failed: ${e.getMessage}>") }
      println(s"v$v keys=${m.keys.mkString(",")} buckets=${m.numBuckets} " +
        s"epochStart=${SnapshotStore.isEpochStart(spark, root, v)} " +
        s"$keyCol=$keyVal -> ${rows.mkString("; ")}")
    }
    if (args.length > 3) {
      val from = args(3).toLong
      val feed = ChangeFeed.readChanges(spark, root, Seq(keyCol), from, vs.last)
      println("feed rows for the key:")
      feed.where(col(keyCol) === keyVal)
        .orderBy(col(ChangeFeed.CommitVersion))
        .collect().foreach(r => println(s"  $r"))
    }
    spark.stop()
  }
}
