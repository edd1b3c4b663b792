package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join handles most cases at runtime; [[saltedJoin]] is
  * the explicit fallback for pathological keys (a handful of keys
  * holding most rows): the left (large, skewed) side gets a random
  * salt in [0, buckets), the right side is replicated `buckets` times,
  * and the join key becomes (key, salt) — spreading each hot key over
  * `buckets` reducers at the cost of replicating the smaller side.
  */
object Skew {

  /** Inner-join `large` (skewed on `key`) with `small`, salted into
    * `buckets` sub-keys. Both inputs must share the join column name.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
