package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job profile of one bench key (guide §1: measure first).
  *
  * Runs `<key>` once warm + once timed and prints every Spark job the
  * timed run scheduled: job id, duration, and the callsite/description
  * — the breakdown that says WHERE a multi-job operator (table
  * lifecycle, Lloyd training, iterative closure) spends its seconds,
  * which `TimeOne`'s single number cannot.
  *
  * Usage: runMain graft.tools.ProfileKey <key>[,key2,...] [sfDir] [warmDir]
  */
object ProfileKey {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val warmDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MPB", "4194304"))
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { key =>
      val fn = graft.SparkEntry.queries(key)

      // warm-up run (codegen/JIT), mirrors Bench
      try { fn(spark, warmDir).count(); () } catch { case _: Throwable => () }
      spark.catalog.clearCache(); graft.Caching.unpersistAll()

      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]
      val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String, Int)]
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobs.put(e.jobId, (e.time, desc, e.stageInfos.map(_.numTasks).sum))
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit = {
          Option(jobs.remove(e.jobId)).foreach { case (t0, desc, tasks) =>
            done.add((e.jobId, (e.time - t0) / 1e3, desc, tasks))
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      // driver stack sampler (guide §7.3): what the MAIN thread does in
      // the gaps between jobs — planning, metadata I/O, commit protocol
      val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]
      val main = Thread.currentThread()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val st = main.getStackTrace
          // first frame in graft/spark-sql code below this tool
          val frame = st.find { e =>
            val c = e.getClassName
            (c.startsWith("graft.") && !c.contains("ProfileKey")) ||
              c.startsWith("org.apache.spark.sql.catalyst") ||
              c.startsWith("org.apache.spark.sql.execution")
          }.map(e => e.getClassName.split("\\.").last + "." + e.getMethodName)
            .getOrElse(st.drop(2).headOption.fold("?")(e =>
              e.getClassName.split("\\.").last + "." + e.getMethodName))
          samples.merge(frame, 1, (a, b) => a + b)
          sys.env.get("PROFILE_STACK_FOR").foreach { needle =>
            if (frame.contains(needle) && samples.get(frame) == 3)
              st.foreach(e => System.err.println(s"[stack] $e"))
          }
          Thread.sleep(5)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let the listener bus drain
      spark.catalog.clearCache(); graft.Caching.unpersistAll()

      val rows = done.toArray(Array.empty[(Int, Double, String, Int)]).sortBy(_._1)
      println(f"[profile] $key rows=$n wall=$wall%.3f s, ${rows.length} jobs")
      var acc = 0.0
      rows.foreach { case (id, dur, desc, tasks) =>
        acc += dur
        println(f"[profile]   job=$id%3d  ${dur}%7.3f s  tasks=$tasks%4d  $desc")
      }
      println(f"[profile] sum-of-jobs=${acc}%.3f s (gaps = driver/planning time: ${wall - acc}%.3f s)")
      import scala.jdk.CollectionConverters._
      val top = samples.asScala.toSeq.sortBy(-_._2).take(20)
      val tot = math.max(samples.asScala.values.map(_.toInt).sum, 1)
      println(s"[profile] driver main-thread samples (top 20 of $tot):")
      top.foreach { case (f, c) =>
        println(f"[profile]   ${100.0 * c.toInt / tot}%5.1f%%  $f")
      }
    }
    spark.stop()
  }
}
