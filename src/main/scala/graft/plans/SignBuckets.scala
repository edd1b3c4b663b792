package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All sign-LSH bucket ids for one vector across every hash table, in
  * ONE pass: `result[t] = Σ_p (dot(vec, planes[t][p]) >= 0) << p`.
  *
  * Semantically equivalent to the higher-order-function pyramid
  * `transform(tables, t => aggregate(zip_with(t, bits, ...), ...))`
  * over a `typedLit` plane tensor, but evaluated as a tight primitive
  * triple loop (tables × planes × dim multiply-adds) instead of
  * per-element lambda-tree interpretation — the signature computation
  * is the dominant cost of LSH bucketing at corpus scale
  * ([[graft.operators.Similarity.lshTopK]] fans every corpus vector
  * out ×numTables, and each fan-out row needs its bucket id).
  *
  * `planes` must be a foldable (literal) `array<array<array<double>>>`
  * — the plane tensor is evaluated once at plan time into a primitive
  * `double[][][]` that generated code reaches through a reference
  * object, so neither interpreted nor codegen evaluation re-walks the
  * literal per row. Null handling matches the embedding contract
  * (non-null vectors): a null vector yields null; null elements read
  * as 0 (embeddings carry none).
  */
case class SignBuckets(vec: Expression, planes: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = planes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = vec.nullable

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, planes.dataType) match {
    case (ArrayType(FloatType, _),
          ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) if planes.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_sign_buckets expects (array<float>, foldable array<array<array<double>>>), " +
        s"got (${vec.dataType}, ${planes.dataType}, foldable=${planes.foldable})")
  }

  override def prettyName: String = "graft_sign_buckets"

  // keep the plane tensor OUT of every plan string: the foldable
  // literal (tables × planes × dim doubles) would otherwise be
  // stringified into each plan-description event and tree dump —
  // profiled r19: GenericArrayData.toString was ~7% of s02's driver
  // samples. The literal stays a CHILD (semantics, canonicalization
  // and codegen untouched); only printing is redacted.
  override def flatArguments: Iterator[Any] = Iterator(vec)
  override protected def stringArgs: Iterator[Any] = Iterator(vec)
  override def sql: String = s"$prettyName(${vec.sql}, <planes>)"

  /** Plane tensor, materialized once from the literal. */
  @transient lazy val kernel: SignBucketsKernel = {
    val top = planes.eval(null).asInstanceOf[ArrayData]
    val t = Array.tabulate(top.numElements()) { ti =>
      val tbl = top.getArray(ti)
      Array.tabulate(tbl.numElements()) { pi =>
        tbl.getArray(pi).toDoubleArray()
      }
    }
    new SignBucketsKernel(t)
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null
    else new GenericArrayData(kernel.compute(v.asInstanceOf[ArrayData]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("signBucketsKernel", kernel, classOf[SignBucketsKernel].getName)
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = new $gad($kRef.compute($v));")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, planes = newRight)
}

/** The primitive triple loop, shared by interpreted and generated
  * evaluation (generated code calls [[compute]] through a codegen
  * reference object — one virtual call per row, JIT-compiled body).
  */
class SignBucketsKernel(planes: Array[Array[Array[Double]]]) extends Serializable {
  def compute(v: ArrayData): Array[Long] = {
    val n = v.numElements()
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val tbl = planes(t)
      var bucket = 0L
      var p = 0
      while (p < tbl.length) {
        val plane = tbl(p)
        val d = if (plane.length < n) plane.length else n
        var acc = 0.0d
        var i = 0
        while (i < d) {
          if (!v.isNullAt(i)) acc += v.getFloat(i).toDouble * plane(i)
          i += 1
        }
        if (acc >= 0.0d) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }
}
