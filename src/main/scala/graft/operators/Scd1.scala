package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD1 (latest-record-wins) semantics.
  *
  * Reference analog: the clean-layer `MERGE ... WHEN MATCHED UPDATE`
  * statements (e.g. `/root/reference/02 Location Entity.sql:247-280`,
  * `/root/reference/09 Order Entity.sql:110-170`): the newest version
  * of each business key replaces the old one.
  *
  * Spark-first design: one hash shuffle on the business key, a
  * row_number window, no global sort, no driver-side state. AQE
  * handles skewed keys. At 100 TB this is a single exchange over the
  * delta + base union — the same cost profile as a shuffled MERGE.
  */
object Scd1 {

  private val RN = "__graft_rn"

  /** Latest row per business key, ordered by `orderBy` descending
    * priority (pass e.g. `col("ts").desc, col("id").desc`). The
    * caller must make the ordering total (tie-break on a unique col)
    * for deterministic output.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(RN, row_number().over(w)).where(col(RN) === 1).drop(RN)
  }

  /** SCD1 merge: apply a delta batch onto a base snapshot; the newest
    * version (per `orderBy`) survives. Schema drift between the sides
    * (e.g. an audit column only the batch path carries) is tolerated:
    * a column missing from one side is null there — the same additive
    * schema-evolution contract a table-format MERGE gives you.
    */
  def merge(base: DataFrame, delta: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame =
    latestByKey(base.unionByName(delta, allowMissingColumns = true), keys, orderBy)
}
