package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins: both sides of a
  * recurring fact⋈fact join are written bucketed (and sorted) on the
  * join key, so every later join between them runs with NO shuffle
  * exchange — the bucket files line up one-to-one.
  *
  * This is the 100 TB answer to "this join shuffles every night":
  * pay the shuffle once at write time, then every downstream join of
  * the bucketed tables is exchange-free (and with `sortBy`,
  * sort-free). The reference's nightly MERGE loops over orders /
  * order_items are exactly this shape.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Write `df` hive-style partitioned by the given columns — a query
    * filtering on them prunes whole directories before any IO (the
    * first-line scan saver for date-partitioned 100 TB facts).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
