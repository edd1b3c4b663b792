package graft.connector

import java.util.{Optional, OptionalLong}

import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
import org.apache.spark.sql.types._

import graft.store.SnapshotStore.ColStat

/** One analyzed column's statistics in DSv2 form
  * ([[graft.store.SnapshotStore.analyze]] wrote them; [[GraftScan]]
  * reports them). Min/max are re-materialized as the CATALYST-INTERNAL
  * boxed values Spark's estimation code consumes — epoch days for
  * dates, epoch micros for timestamps, boxed primitives for numerics;
  * types without a meaningful ordering image report no bounds.
  */
final class GraftColumnStatistics(st: ColStat, dt: DataType)
    extends ColumnStatistics {
  override def distinctCount(): OptionalLong = OptionalLong.of(st.ndv)
  override def nullCount(): OptionalLong = OptionalLong.of(st.nullCount)
  override def avgLen(): OptionalLong =
    st.avgLen.fold(OptionalLong.empty())(OptionalLong.of)
  override def maxLen(): OptionalLong =
    st.maxLen.fold(OptionalLong.empty())(OptionalLong.of)
  override def min(): Optional[Object] = conv(st.min)
  override def max(): Optional[Object] = conv(st.max)

  private def conv(v: Option[String]): Optional[Object] = v match {
    case None => Optional.empty()
    case Some(s) =>
      val o: Any = dt match {
        case IntegerType => java.lang.Integer.valueOf(s.toInt)
        case LongType => java.lang.Long.valueOf(s.toLong)
        case ShortType => java.lang.Short.valueOf(s.toShort)
        case ByteType => java.lang.Byte.valueOf(s.toByte)
        case DoubleType => java.lang.Double.valueOf(s.toDouble)
        case FloatType => java.lang.Float.valueOf(s.toFloat)
        case _: DecimalType => Decimal(new java.math.BigDecimal(s))
        case DateType => java.lang.Integer.valueOf(s.toInt) // epoch days
        case TimestampType => java.lang.Long.valueOf(s.toLong) // epoch micros
        case _ => null
      }
      if (o == null) Optional.empty() else Optional.of(o.asInstanceOf[Object])
  }
}
