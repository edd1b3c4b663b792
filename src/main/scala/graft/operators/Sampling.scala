package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed sampling for corpus subsetting.
  *
  * [[weightedSample]] is weighted sampling without replacement via
  * exponential race keys (Efraimidis & Spirakis 2006, public
  * algorithm): each row gets key u^(1/w) for a per-row uniform u, and
  * the k largest keys are the sample. One narrow pass to key, then a
  * distributed top-k (TakeOrderedAndProject) — no shuffle of the
  * corpus, state O(k) per partition, mergeable by construction.
  *
  * u is a seeded hash of the row id, NOT randomness: the sample of a
  * 100 TB corpus is a pure function of (ids, weights, seed) —
  * re-derivable forever, stable across re-runs and engine versions,
  * the same reproducibility contract as
  * [[graft.functions.Funcs.splitBucket]].
  */
object Sampling {

  /** Per-row uniform in (0,1): bounded modular hash of (id, seed). */
  private def uniform(id: Column, seed: Long): Column = {
    val m = 2147483647L // 2^31 - 1
    (pmod(xxhash64(id.cast("string"), lit(seed)), lit(m)).cast("double") + 1.0d) /
      (m.toDouble + 2.0d)
  }

  /** The race key u^(1/w); rows with non-positive weight never win. */
  def raceKey(id: Column, weight: Column, seed: Long = 11L): Column =
    when(weight > 0, pow(uniform(id, seed), lit(1.0d) / weight))
      .otherwise(lit(-1.0d))

  /** k-row weighted sample without replacement. Deterministic for a
    * fixed seed; ties (hash collisions) broken by id.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long = 11L): DataFrame =
    df.withColumn("__race", raceKey(col(idCol), col(weightCol), seed))
      .where(col("__race") >= 0)
      .orderBy(col("__race").desc, col(idCol).asc)
      .limit(k)
      .drop("__race")
}
