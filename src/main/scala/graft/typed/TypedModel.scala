package graft.typed

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

import graft.Tables

/** Typed (`Dataset[T]`) view of the warehouse: case-class encoders
  * where compile-time safety helps (ETL plumbing, custom aggregation
  * logic), while the relational surface stays DataFrame. Encoders are
  * Spark's own product encoders — full Tungsten codegen, no Kryo.
  */
object TypedModel {

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  final case class LineItem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: Timestamp)

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
      value: Double, props: String)

  def orders(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._
    Tables.orders(s, d).as[Order]
  }

  def lineitems(s: SparkSession, d: String): Dataset[LineItem] = {
    import s.implicits._
    Tables.lineitem(s, d).as[LineItem]
  }

  def events(s: SparkSession, d: String): Dataset[Event] = {
    import s.implicits._
    Tables.events(s, d).as[Event]
  }

  /** Typed accumulator for [[RevenueAgg]]. */
  final case class RevAcc(n: Long, revenueE4: Long)

  /** Custom typed Aggregator: order count + exact integer revenue
    * (price_cents × (100 − disc_cents), the same arithmetic as the
    * relational surface — so the DuckDB oracle validates the typed
    * path too). Partial aggregation (reduce/merge) works map-side
    * exactly like a codegen'd SQL aggregate.
    */
  object RevenueAgg extends Aggregator[LineItem, RevAcc, RevAcc] {
    private def cents(x: Double): Long = math.round(x * 100)
    override def zero: RevAcc = RevAcc(0L, 0L)
    override def reduce(b: RevAcc, a: LineItem): RevAcc =
      RevAcc(b.n + 1,
        b.revenueE4 + cents(a.l_extendedprice) * (100L - cents(a.l_discount)))
    override def merge(x: RevAcc, y: RevAcc): RevAcc =
      RevAcc(x.n + y.n, x.revenueE4 + y.revenueE4)
    override def finish(r: RevAcc): RevAcc = r
    override def bufferEncoder: Encoder[RevAcc] = Encoders.product[RevAcc]
    override def outputEncoder: Encoder[RevAcc] = Encoders.product[RevAcc]
  }
}
