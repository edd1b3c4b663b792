package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without the theta-join explosion.
  *
  * Spark plans `points JOIN intervals ON ts >= start AND ts < end`
  * as a broadcast-nested-loop / cartesian — O(|points| × |intervals|).
  * [[pointInInterval]] instead grids time into `bucketWidth`-second
  * cells: every interval explodes to the cells it covers, points map
  * to their single cell, and the join becomes an equi-join on
  * (optional key, cell) followed by the exact range filter. Cost is
  * O(|points| + Σ interval-span/bucketWidth) with one hash shuffle —
  * the standard distributed interval-join shape. Pick `bucketWidth`
  * near the typical interval length so each interval covers O(1)
  * cells.
  */
object RangeJoin {

  /** @param points      rows carrying `ptsCol` (timestamp)
    * @param intervals   rows carrying [`startCol`, `endCol`) timestamps
    * @param keyCols     optional extra equality keys (both sides)
    * @param bucketWidth grid cell width in seconds
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptsCol: String, startCol: String, endCol: String,
                      keyCols: Seq[String] = Nil,
                      bucketWidth: Long = 86400L): DataFrame = {
    val cell = "__rj_cell"
    val p = points.withColumn(cell,
      floor(unix_timestamp(col(ptsCol)) / bucketWidth).cast("long"))
    val iv = intervals.withColumn(cell,
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketWidth).cast("long"),
        // end is exclusive: the last covered cell is (end - 1s)'s cell
        floor((unix_timestamp(col(endCol)) - 1) / bucketWidth).cast("long"))))
    p.join(iv, keyCols :+ cell)
      .where(col(ptsCol) >= col(startCol) && col(ptsCol) < col(endCol))
      .drop(cell)
  }
}
