package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between two snapshots.
  *
  * Reference analog: Snowflake streams (`METADATA$ACTION` /
  * `METADATA$ISUPDATE`, e.g. `/root/reference/02 Location Entity.sql:
  * 86-90,303-310`) which surface INSERT/UPDATE/DELETE deltas.
  *
  * Spark-first design: a single full-outer join on the business key
  * with null-safe value comparison — one co-partitioned shuffle of
  * both snapshots; unchanged rows are dropped before anything wide
  * happens downstream.
  */
object Cdc {

  /** Diff `oldSnap` → `newSnap` on `keys`, comparing `compareCols`.
    * Output: key columns, `action` ('I'|'U'|'D'), and old_/new_
    * prefixed compare columns. Unchanged rows are excluded.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    // explicit presence markers: a row whose compare columns are all
    // null must still count as present on its side
    val o = compareCols.foldLeft(oldSnap)((d, c) => d.withColumnRenamed(c, s"old_$c"))
      .withColumn("__in_old", lit(true))
    val n = compareCols.foldLeft(newSnap)((d, c) => d.withColumnRenamed(c, s"new_$c"))
      .withColumn("__in_new", lit(true))
    val joined = o.join(n, keys, "full_outer")

    val inOld = col("__in_old").isNotNull
    val inNew = col("__in_new").isNotNull
    val changed = compareCols.map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)

    joined
      .withColumn("action",
        when(!inOld, "I").when(!inNew, "D").when(changed, "U"))
      .where(col("action").isNotNull)
      .select((keys.map(col) :+ col("action")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
