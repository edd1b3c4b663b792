package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd exact integer dot product over two `array<float>` columns
  * in 1e-12 units: Σ round(xᵢ·1e6) · round(yᵢ·1e6) as int64.
  *
  * Semantically identical to the higher-order-function form
  * `aggregate(zip_with(a, b, (x,y) => round(x*1e6)L * round(y*1e6)L),
  * 0L, _+_)` — including HALF_UP rounding (away from zero on the
  * half, matching Spark's `round`) and null semantics (null result on
  * length mismatch or any null element, which is what zip_with +
  * aggregate produce) — but runs as a tight primitive loop inside
  * whole-stage codegen instead of allocating intermediate arrays and
  * evaluating lambda trees per element. This is the hot path of every
  * cosine in [[graft.operators.Similarity]] / [[graft.operators.Dedup]].
  */
case class DotProductE12(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_dot_e12 expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def prettyName: String = "graft_dot_e12"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += DotProductE12.e6(x.getFloat(i)) * DotProductE12.e6(y.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val vx = ctx.freshName("vx")
      val vy = ctx.freshName("vy")
      val lx = ctx.freshName("lx")
      val ly = ctx.freshName("ly")
      s"""
      |final int $n = $a.numElements();
      |boolean $bad = $n != $b.numElements();
      |long $acc = 0L;
      |if (!$bad) {
      |  for (int $i = 0; $i < $n; $i++) {
      |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
      |    final double $vx = ((double) $a.getFloat($i)) * 1000000.0d;
      |    final double $vy = ((double) $b.getFloat($i)) * 1000000.0d;
      |    final long $lx = $vx >= 0.0d ? (long) Math.floor($vx + 0.5d) : (long) Math.ceil($vx - 0.5d);
      |    final long $ly = $vy >= 0.0d ? (long) Math.floor($vy + 0.5d) : (long) Math.ceil($vy - 0.5d);
      |    $acc += $lx * $ly;
      |  }
      |}
      |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductE12 {
  /** round-half-away-from-zero, matching Spark's `round(double)`. */
  def e6(f: Float): Long = {
    val v = f.toDouble * 1000000.0d
    if (v >= 0.0d) math.floor(v + 0.5d).toLong else math.ceil(v - 0.5d).toLong
  }
}
