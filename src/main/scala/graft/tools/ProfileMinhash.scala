package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-phase profile of minhashBands (scratch tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFuncs
    import graft.operators.Dedup
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p] $label ${(System.nanoTime() - t0) / 1e9}%.3f s -> $r")
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep")
      val docs = graft.Tables.documents(spark, sfDir)
      t("docs count")(docs.count())
      val exploded = docs.select(col("doc_id"),
        explode_outer(TextFuncs.shingles(col("text"), 3)).as("__sh"))
      t("explode count")(exploded.count())
      t("explode+crc32 agg")(exploded.select(sum(crc32(col("__sh")))).collect()(0))
      val params = Dedup.minhashParams(64)
      val withX = exploded.withColumn("__x", crc32(col("__sh")) % 2147483647L)
      val aggs = params.zipWithIndex.map { case ((a, b), i) =>
        min((lit(a) * col("__x") + lit(b)) % 2147483647L).as(s"__h$i")
      }
      t("sig groupBy")(withX.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count())
      t("full minhashBands")(Dedup.minhashBands(docs, "text", "doc_id").count())
    }
    spark.stop()
  }
}
