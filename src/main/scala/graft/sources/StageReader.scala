package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Batch staged ingest — the reference's COPY-into-stage layer.
  *
  * Reference analog: every entity's stage table is all-text with four
  * audit columns filled from file metadata
  * (`/root/reference/02 Location Entity.sql:70-104`,
  * `09 Order Entity.sql:40-66`; JSON for delivery_agent —
  * `with procedures/delivery_agent_proc.sql`).
  *
  * Design: schema-on-read — everything lands as STRING (exactly the
  * reference's stage contract), audit columns come from file metadata
  * functions (no extra pass), and the typed "clean" layer is produced
  * by [[typed]] with TRY_CAST semantics (bad values → null, never a
  * failed job — the 100 TB property you want from ingest).
  */
object StageReader {

  /** All-text schema for the given column names (stage contract). */
  def textSchema(cols: Seq[String]): StructType =
    StructType(cols.map(c => StructField(c, StringType, nullable = true)))

  /** Normalize a file URI for joining: `input_file_name()` and the
    * binaryFile source render the scheme differently
    * (`file:///x` vs `file:/x`).
    */
  private def normPath(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  /** `input_file_name()` additionally percent-encodes (a space becomes
    * `%20`) while binaryFile's `path` is unescaped — decode before
    * normalizing so the md5 join key matches for any file name.
    */
  private def normInputFileName(c: Column): Column =
    normPath(url_decode(c))

  /** Content MD5 per staged file (the reference's `_stg_file_md5`
    * audit column). A second, per-file-parallel pass over the staged
    * bytes — unavoidable for a content hash — joined back broadcast
    * (one row per FILE, never per data row).
    */
  private def fileMd5(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(normPath(col("path")).as("__md5_path"),
        md5(col("content")).as("_stg_file_md5"))

  private def withAudit(df: DataFrame, md5s: DataFrame): DataFrame =
    df.withColumn("_stg_file_name", input_file_name())
      .withColumn("_stg_file_load_ts", expr("_metadata.file_modification_time"))
      .withColumn("_stg_file_size", expr("_metadata.file_size"))
      .join(broadcast(md5s), normInputFileName(col("_stg_file_name")) === col("__md5_path"), "left")
      .drop("__md5_path")
      .withColumn("_copy_data_ts", current_timestamp())

  /** Staged CSV read: all-text columns + audit columns. */
  def csv(spark: SparkSession, path: String, cols: Seq[String],
          header: Boolean = true): DataFrame =
    withAudit(spark.read.schema(textSchema(cols))
      .option("header", header.toString).csv(path), fileMd5(spark, path))

  /** Staged JSON read (delivery_agent.json analog): declared fields
    * land as text, extras are ignored, bad records become nulls
    * (PERMISSIVE), matching stage-layer tolerance.
    */
  def json(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    withAudit(spark.read.schema(textSchema(cols)).json(path), fileMd5(spark, path))

  /** Coerce a self-describing (typed) source to the all-text stage
    * contract: declared columns cast to string, missing declared
    * columns null-filled, extras dropped — the same tolerance the
    * text sources get from their schema-on-read.
    */
  private def toText(df: DataFrame, cols: Seq[String]): DataFrame = {
    // case-insensitive resolution, matching Spark's default analyzer
    // behavior — an upstream 'OrderID' satisfies a declared 'orderid'.
    // Source columns differing ONLY in case (OrderID + orderid) that
    // both match a declared column are ambiguous: fail loudly like
    // Spark's ambiguous-reference analyzer error, never last-wins.
    val declared = cols.map(_.toLowerCase).toSet
    val byLower = df.columns.groupBy(_.toLowerCase)
    val ambiguous = byLower.collect {
      case (lc, actuals) if actuals.length > 1 && declared(lc) => actuals.mkString("[", ", ", "]")
    }
    if (ambiguous.nonEmpty)
      throw new IllegalArgumentException(
        "ambiguous case-insensitive stage columns: " + ambiguous.mkString("; ") +
          " — multiple source columns resolve to the same declared column")
    val have = df.columns.map(c => c.toLowerCase -> c).toMap
    df.select(cols.map(c => have.get(c.toLowerCase)
      .map(actual => col(s"`$actual`").cast(StringType))
      .getOrElse(lit(null).cast(StringType)).as(c)): _*)
  }

  /** Staged ORC read: columnar drops from upstream warehouses carry
    * their own schema; it is coerced to the stage contract ([[toText]])
    * so the downstream typed/SCD layers are format-agnostic.
    */
  def orc(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    withAudit(toText(spark.read.orc(path), cols), fileMd5(spark, path))

  /** Staged Parquet read — see [[orc]]. */
  def parquet(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    withAudit(toText(spark.read.parquet(path), cols), fileMd5(spark, path))

  /** Clean-layer typing with TRY_CAST semantics: each (column → DDL
    * type) cast yields null on garbage instead of failing the job,
    * exactly like the reference's TRY_CAST / TRY_TO_* merges
    * (`03 Restaurant Entity.sql:140-165`).
    */
  def typed(stage: DataFrame, casts: Seq[(String, String)]): DataFrame =
    casts.foldLeft(stage) { case (df, (c, t)) =>
      df.withColumn(c, expr(s"try_cast($c AS $t)"))
    }

  /** Convenience: stage → typed → SCD1-deduped clean snapshot. */
  def cleanSnapshot(stage: DataFrame, casts: Seq[(String, String)],
                    keys: Seq[String], orderBy: Seq[Column]): DataFrame =
    graft.operators.Scd1.latestByKey(typed(stage, casts), keys, orderBy)
}
