package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: times the named SparkEntry queries
  * (args) N times each at SPARK_GRAFT_SF_DIR, printing every rep —
  * the local feedback loop for performance work, not a driver surface.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        spark.catalog.clearCache(); graft.Caching.unpersistAll()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[profile] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    spark.stop()
  }
}
