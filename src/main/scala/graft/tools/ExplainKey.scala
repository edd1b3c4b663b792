package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Dump `.explain("formatted")` for one bench key to a file — the
  * plan-evidence artifact for optimization rounds (plans/rNN/). Same
  * session settings as [[graft.TimeOne]]. Args: key sfDir outFile.
  */
object ExplainKey {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Array(name, dir, out) = args.take(3)
    val df = SparkEntry.queries(name)(spark, dir)
    val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    Files.write(Paths.get(out), txt.getBytes(StandardCharsets.UTF_8))
    println(s"EXPLAINED $name -> $out (${txt.length} chars)")
    spark.stop()
  }
}
