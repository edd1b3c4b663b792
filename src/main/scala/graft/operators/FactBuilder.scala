package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Star-schema fact construction: a fact source joined to its
  * dimensions with explicit broadcast control.
  *
  * Reference analog: the consumption-layer fact MERGEs that resolve
  * dim surrogate keys (`/root/reference/with procedures/
  * order_item_proc.sql:178-230`).
  *
  * At 100 TB the fact side never moves for a dim lookup: every dim
  * small enough to broadcast is broadcast; anything larger joins on
  * its key with AQE free to pick the strategy.
  */
object FactBuilder {

  final case class Dim(df: DataFrame, on: Column, broadcastHint: Boolean = true)

  def star(fact: DataFrame, dims: Seq[Dim], joinType: String = "inner"): DataFrame =
    dims.foldLeft(fact) { case (f, d) =>
      f.join(if (d.broadcastHint) broadcast(d.df) else d.df, d.on, joinType)
    }
}
