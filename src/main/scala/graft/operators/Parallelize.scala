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
    *
    * The probe (`df.rdd.getNumPartitions`) is only taken on
    * SHUFFLE-FREE plans: a frame downstream of a join/aggregate/
    * repartition already has ≥ `spark.sql.shuffle.partitions`-worth of
    * parallelism (the rescue is only ever needed for raw narrow
    * scans), and materializing an AQE plan's RDD would eagerly execute
    * its upstream stages just to read a partition count.
    */
  def ensure(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    // note GlobalLimit is NOT here: a limit collapses to one partition
    // — precisely the case that needs the rescue (and its plan carries
    // no exchange for the probe to execute)
    val shuffled = df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort |
           _: RepartitionOperation | _: Deduplicate => true
      case _ => false
    }
    if (shuffled) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
