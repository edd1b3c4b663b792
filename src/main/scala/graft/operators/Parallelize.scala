package graft.operators

import org.apache.spark.sql.DataFrame

/** Low-parallelism rescue for CPU-heavy derivations.
  *
  * Operators like minhash shingling, simhash tokenizing, and LSH
  * signature hashing do orders of magnitude more CPU work per input
  * byte than a scan — their parallelism is whatever the SOURCE scan
  * yielded. At data scale inputs carry far more splits than the
  * cluster has cores and this helper is the identity. But a small
  * input (one parquet row group — unsplittable no matter what
  * `maxPartitionBytes` says) pins the whole signature pipeline to ONE
  * core; there, one narrow shuffle of the raw rows is repaid ~dozens
  * of times over by the fan-out work that follows.
  */
object Parallelize {

  /** `df` repartitioned to the session's default parallelism iff its
    * current plan yields fewer partitions than that — otherwise the
    * frame is returned untouched (no shuffle at scale).
    */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
