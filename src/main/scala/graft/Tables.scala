package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver-generated test schema
  * (see TESTDATA.md). At cluster scale these would be partitioned /
  * bucketed catalog tables; the loaders keep that substitution to one
  * place.
  */
object Tables {
  /** One driver-side footer read supplies the read schema explicitly:
    * Spark 4's schema inference launches a distributed job per
    * `read.parquet` call (ParquetUtils.inferSchema →
    * mergeSchemasInParallel, even for a single footer), and EVERY
    * bench/verify key paid that job once per source table per
    * construction (profiled r19: `mergeSchemasInParallel` showed up in
    * every key's driver samples, 2–5%). The footer conversion is the
    * same conf-driven one inference uses (GraftSqlShims — serialized
    * Spark schema preferred, nanos-as-long honored), `asNullable`
    * matches how file-source relations present fields. Any surprise
    * falls back loudly to the inference path (guide §1.2: remove whole
    * jobs; §5: O(1) metadata work belongs on the driver).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema =
      try Some(org.apache.spark.sql.graft.GraftSqlShims.asNullable(
        org.apache.spark.sql.graft.GraftSqlShims.parquetFooterSchema(
          spark, spark.sessionState.newHadoopConf(),
          new org.apache.hadoop.fs.Path(path))))
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] table footer-schema read failed for " +
            s"$path (${e.getClass.getSimpleName}: ${e.getMessage}) — falling " +
            "back to schema inference")
          None
      }
    schema.fold(spark.read.parquet(path))(s => spark.read.schema(s).parquet(path))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark 4 refuses by
    * default; with `spark.sql.legacy.parquet.nanosAsLong=true` it
    * arrives as a long that we truncate to a µs timestamp here (the
    * same truncation Spark ≤3 applied on read).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
