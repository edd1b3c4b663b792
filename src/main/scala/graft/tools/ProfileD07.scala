package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profile of the d07 closure pipeline (scratch tool). */
object ProfileD07 {
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
    import graft.operators.Dedup
    var nJobs = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        nJobs += 1
    })
    def t[A](label: String)(f: => A): A = {
      val j0 = nJobs
      val t0 = System.nanoTime()
      val r = f
      println(f"[p] $label ${(System.nanoTime() - t0) / 1e9}%.3f s jobs=${nJobs - j0}")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep")
      spark.catalog.clearCache()
      val docs = graft.Tables.documents(spark, sfDir)
      val bands = t("bands+persist") {
        val b = Dedup.minhashBands(docs, "text", "doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        b.count(); b
      }
      val verified = t("jaccard-verified pairs (materialize count)") {
        val v = Dedup.ngramJaccard(
            Dedup.candidatePairs(bands, "doc_id"), docs, "text", "doc_id")
          .where(col("jaccard_e6") >= 500000L)
        v.count(); v
      }
      val cl = t("clusters") { Dedup.clusters(verified) }
      t("final count") { println("rows=" + cl.count()) }
      // inline copy of the loop with per-step timing
      t("inline loop") {
        val pairs = verified
        val edges = t("  edges ckpt")(pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
          .distinct().localCheckpoint(true))
        var labels = t("  labels init")(edges.select(col("src").as("node")).distinct()
          .withColumn("label", col("node")).localCheckpoint(true))
        var round = 0
        var converged = false
        while (!converged && round < 30) {
          round += 1
          val nbrMin = edges
            .join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node"))
            .agg(min(col("label")).as("__nbr"))
          val stepped = labels.join(nbrMin, Seq("node"), "left")
            .select(col("node"),
              least(col("label"), coalesce(col("__nbr"), col("label"))).as("label"),
              coalesce(col("__nbr") < col("label"), lit(false)).as("__imp"))
          labels = t(s"  round $round ckpt")(stepped.as("x")
            .join(stepped.select(col("node").as("__ln"), col("label").as("__ll")),
              col("x.label") === col("__ln"), "left")
            .select(col("x.node").as("node"),
              coalesce(col("__ll"), col("x.label")).as("label"),
              col("x.__imp").as("__imp")).localCheckpoint(true))
          converged = t(s"  round $round check")(
            !labels.agg(coalesce(max(col("__imp")), lit(false))).head.getBoolean(0))
        }
        round
      }
    }
    spark.stop()
  }
}
