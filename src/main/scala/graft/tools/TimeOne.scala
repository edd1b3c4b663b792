package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    // honor the driver's core-count contract like Bench does (default
    // unchanged at 32) — r18 verdict item #1 requires solo medians at
    // 32 AND 8 cores to adjudicate scaling/transient questions
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0); val dir = args(1)
    // warm-up (codegen compile) on a smaller SF if given, else the
    // measured dir itself
    val warmDir = if (args.length > 2) args(2) else dir
    SparkEntry.queries(name)(spark, warmDir).count()
    (1 to 3).foreach { i =>
      spark.catalog.clearCache(); graft.Caching.unpersistAll()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"TIME$i=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
