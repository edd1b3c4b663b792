package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each probe row, attach the latest
  * build row with the same key and `buildTs <= probeTs`.
  *
  * Spark has no native as-of join, and the naive formulation
  * (range-join + per-key max) explodes into an O(probe × build)
  * theta-join. This operator composes existing ops instead of a
  * custom physical plan: tag and union both sides, sort each key
  * partition once by (ts, side, tiebreak), and carry the last build
  * payload forward with `last(..., ignoreNulls)` over a running
  * window. One shuffle on the key, no row multiplication — the
  * standard distributed as-of shape, fully AQE/codegen friendly.
  *
  * The build payload travels as a single struct (not per-column), so
  * the carried match is always one consistent build row even when
  * build columns contain nulls. Build rows sort before probe rows at
  * equal timestamps, so a build row exactly at the probe's ts is
  * matched (`<=` semantics); ties between build rows at the same ts
  * resolve to the greatest `tiebreak`.
  */
object AsOfJoin {

  /** @param probe      left side (each row gets a match or nulls)
    * @param build      right side (history being probed)
    * @param probeKey   join key column in `probe`
    * @param buildKey   join key column in `build`
    * @param probeTs    event-time column in `probe`
    * @param buildTs    event-time column in `build`
    * @param buildCols  build columns to attach (prefixed `asof_`)
    * @param tiebreak   build column making the order total at equal ts
    */
  def leftAsOf(probe: DataFrame, build: DataFrame,
               probeKey: String, buildKey: String,
               probeTs: String, buildTs: String,
               buildCols: Seq[String], tiebreak: String): DataFrame = {
    val key = "__asof_key"
    val ts = "__asof_ts"
    val side = "__asof_side" // 0 = build, 1 = probe (build first at ties)
    val tb = "__asof_tb"
    val pay = "__asof_payload"

    val buildSide = build.select(
      col(buildKey).as(key), col(buildTs).as(ts), lit(0).as(side),
      col(tiebreak).as(tb),
      struct(buildCols.map(col): _*).as(pay))
    val payType = buildSide.schema(pay).dataType
    val tbType = buildSide.schema(tb).dataType

    val probeSide = probe
      .withColumn(key, col(probeKey)).withColumn(ts, col(probeTs))
      .withColumn(side, lit(1))
      .withColumn(tb, lit(null).cast(tbType))
      .withColumn(pay, lit(null).cast(payType))
    val buildAligned = probe.columns.foldLeft(buildSide)((d, c) =>
      d.withColumn(c, lit(null).cast(probe.schema(c).dataType)))

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col(side).asc, col(tb).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = probeSide
      .unionByName(buildAligned.select(probeSide.columns.map(col): _*))
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))

    buildCols.foldLeft(carried.where(col(side) === 1)) { (d, c) =>
        d.withColumn(s"asof_$c", col(pay).getField(c))
      }
      .drop(key, ts, side, tb, pay)
  }
}
