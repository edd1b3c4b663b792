package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of each named
  * query (or a default set) so scan pruning / pushdown / broadcast
  * choices can be reviewed. `runMain graft.PlanAudit [sfDir] [q...]`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q06_order_item_fact", "q17_pricing_summary", "q18_region_revenue",
        "s01_ann_bruteforce", "d02_dedup_minhash")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
