package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native kernels for the IVF/PQ ANN family — semantically EXACT
  * replacements for the expression-tree forms in
  * [[graft.operators.Similarity]] (same e12 integer dots, same HALF_UP
  * float→e6 rounding, same first-max tie-breaks, same null semantics),
  * evaluated as tight primitive loops behind ONE expression node each.
  *
  * Why (guide §1.2 "per-task work" + §7.2 plan size): the tree forms
  * build m·k dot expressions over per-centroid `typedLit` arrays —
  * hundreds of literal-array nodes that Catalyst re-walks, re-hashes
  * and re-stringifies through every analysis/optimization pass. At
  * sf0.1 HALF of s06/s07's wall time was DRIVER planning of those
  * trees (profiled: 4.5 s of a 9.0 s run between jobs, dominated by
  * TreeNode/Expression/ScalaReflection frames); the kernels collapse
  * each tree to one node with one foldable tensor literal, and the
  * executed loop stops re-rounding the vector once per centroid.
  */
private object PqKernelMath {
  /** round-half-away-from-zero of x·1e6, matching `DotProductE12.e6`
    * (Spark's `round`) — applied to the FLOAT value, matching the
    * `typedLit(c.map(_.toFloat))` literals of the tree form.
    */
  def e6(f: Float): Long = DotProductE12.e6(f)

  /** Codebook tensor from the foldable literal: e6-rounded float longs
    * for the dots (the tree form's typedLit floats), plus the
    * half-squared-norm in e12 units from the ORIGINAL doubles (the
    * tree form's `lit(c.map(x => x*x).sum / 2 * 1e12)`).
    */
  def roundBooks(books: Expression)
      : (Array[Array[Array[Long]]], Array[Array[Double]]) = {
    val top = books.eval(null).asInstanceOf[ArrayData]
    val e6s = Array.tabulate(top.numElements()) { s =>
      val cb = top.getArray(s)
      Array.tabulate(cb.numElements()) { j =>
        cb.getArray(j).toDoubleArray().map(d => e6(d.toFloat))
      }
    }
    val halves = Array.tabulate(top.numElements()) { s =>
      val cb = top.getArray(s)
      Array.tabulate(cb.numElements()) { j =>
        cb.getArray(j).toDoubleArray().map(x => x * x).sum / 2 * 1e12
      }
    }
    (e6s, halves)
  }

  def booksTypeOk(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
    case _ => false
  }

  /** A foldable second/third argument that EVALUATES to null would NPE
    * the lazy kernel at plan/codegen time — reject it in the type
    * check instead (r18 ADVICE).
    */
  def nonNullFoldable(e: Expression, what: String): TypeCheckResult =
    if (e.eval(null) == null)
      TypeCheckResult.TypeCheckFailure(s"$what must not be a NULL literal")
    else TypeCheckResult.TypeCheckSuccess

  /** All codebooks must share ONE subspace width: PqAdcKernel computes
    * offsets from books(0)(0).length and PqCodesKernel from each
    * codebook's own width — non-uniform widths would silently score
    * wrong slices (r18 ADVICE). Callers enforce dim % m == 0, so this
    * is a loud guard for malformed codebooks, not a behavior change.
    */
  def requireUniformWidths(books: Array[Array[Array[Long]]]): Unit = {
    val widths = books.iterator.flatMap(_.iterator.map(_.length)).toSet
    require(widths.size <= 1,
      s"graft pq kernels require one uniform subspace width, got $widths")
  }
}

/** `array_position(d, array_max(d)).cast("int")` over
  * `d = array(cents.map(c => dot_e12(vec, litFloat(c)).cast(double)))`
  * as one kernel: the IVF coarse-assignment argmax
  * ([[graft.operators.Similarity.ivfAssignExpr]] and the Lloyd
  * training pass). 1-based index, first-max tie-break; null when no
  * centroid produced a non-null dot (null vec, length mismatch, null
  * element) — exactly the tree form's null algebra.
  */
case class ArgmaxDotsE12(vec: Expression, cents: Expression)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = cents
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_dots"

  // plan-string redaction of the centroid tensor (see SignBuckets —
  // the literal stays a child; only printing is trimmed)
  override def flatArguments: Iterator[Any] = Iterator(vec)
  override protected def stringArgs: Iterator[Any] = Iterator(vec)
  override def sql: String = s"$prettyName(${vec.sql}, <cents>)"

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, cents.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _))
        if cents.foldable => PqKernelMath.nonNullFoldable(cents, "graft_argmax_dots centroids")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_argmax_dots expects (array<float>, foldable array<array<double>>), " +
        s"got (${vec.dataType}, ${cents.dataType}, foldable=${cents.foldable})")
  }

  @transient lazy val kernel: ArgmaxDotsKernel = {
    val top = cents.eval(null).asInstanceOf[ArrayData]
    val e6s = Array.tabulate(top.numElements()) { j =>
      top.getArray(j).toDoubleArray().map(d => PqKernelMath.e6(d.toFloat))
    }
    new ArgmaxDotsKernel(e6s)
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else kernel.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("argmaxDotsKernel", kernel,
      classOf[ArgmaxDotsKernel].getName)
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, (v, _) => s"""
      |java.lang.Integer $boxed = $kRef.compute($v);
      |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.intValue(); }
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, cents = newRight)
}

class ArgmaxDotsKernel(cents: Array[Array[Long]]) extends Serializable {
  /** null (no valid dot) or the 1-based first-max index. */
  def compute(v: ArrayData): java.lang.Integer = {
    val n = v.numElements()
    // e6-round the vector ONCE (the tree form re-rounded per centroid —
    // identical longs, k× the work)
    val ve = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null // any null element nulls EVERY dot
      ve(i) = PqKernelMath.e6(v.getFloat(i))
      i += 1
    }
    var best = 0.0d
    var bestIdx = -1
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      if (c.length == n) { // length mismatch = null dot, skipped by array_max
        var acc = 0L
        var k = 0
        while (k < n) { acc += ve(k) * c(k); k += 1 }
        val d = acc.toDouble
        if (bestIdx < 0 || d > best) { best = d; bestIdx = j }
      }
      j += 1
    }
    if (bestIdx < 0) null else java.lang.Integer.valueOf(bestIdx + 1)
  }
}

/** The full per-subspace PQ code array
  * ([[graft.operators.Similarity]]'s `pqCodes`) as one kernel:
  * code(sub) = 1-based first-argmax over
  * `dot_e12(slice(vec, sub·w+1, w), litFloat(cb_j)).toDouble −
  * halfNormE12_j` — identical arithmetic, tie-break and null algebra
  * to the `array(array_position(scores, array_max(scores)) ...)` tree.
  */
case class PqCodesE12(vec: Expression, books: Expression)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = books
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false // array(...) of per-sub codes is never null
  override def prettyName: String = "graft_pq_codes"

  // plan-string redaction of the codebook tensor (see SignBuckets)
  override def flatArguments: Iterator[Any] = Iterator(vec)
  override protected def stringArgs: Iterator[Any] = Iterator(vec)
  override def sql: String = s"$prettyName(${vec.sql}, <books>)"

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, books.dataType) match {
    case (ArrayType(FloatType, _), bt) if PqKernelMath.booksTypeOk(bt) && books.foldable =>
      PqKernelMath.nonNullFoldable(books, "graft_pq_codes codebooks")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_pq_codes expects (array<float>, foldable array<array<array<double>>>), " +
        s"got (${vec.dataType}, ${books.dataType}, foldable=${books.foldable})")
  }

  @transient lazy val kernel: PqCodesKernel = {
    val (e6s, halves) = PqKernelMath.roundBooks(books)
    new PqCodesKernel(e6s, halves)
  }

  override def eval(input: InternalRow): Any =
    kernel.compute(vec.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val kRef = ctx.addReferenceObj("pqCodesKernel", kernel, classOf[PqCodesKernel].getName)
    val vEv = vec.genCode(ctx)
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    // never-null result (a null vector yields an array of null codes),
    // so the kernel call is OUTSIDE any null guard
    ev.copy(code = code"""
      ${vEv.code}
      $ad ${ev.value} = $kRef.compute(${vEv.isNull} ? null : ${vEv.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, books = newRight)
}

class PqCodesKernel(books: Array[Array[Array[Long]]],
                    halves: Array[Array[Double]]) extends Serializable {
  PqKernelMath.requireUniformWidths(books)
  def compute(v: ArrayData): ArrayData = {
    val m = books.length
    val out = new Array[Any](m)
    // a null vector nulls every subspace's scores → array of m nulls
    // (the tree form's array() of null codes, NOT a null array)
    if (v == null) return new GenericArrayData(out)
    val n = v.numElements()
    var s = 0
    while (s < m) {
      val cb = books(s)
      val halfs = halves(s)
      val w = if (cb.length > 0) cb(0).length else 0
      val base = s * w
      // slice(vec, base+1, w): available elements; a short slice (or a
      // null element in it) nulls every dot of this subspace
      var valid = base + w <= n && w > 0
      val ve = new Array[Long](w)
      var i = 0
      while (valid && i < w) {
        if (v.isNullAt(base + i)) valid = false
        else { ve(i) = PqKernelMath.e6(v.getFloat(base + i)); i += 1 }
      }
      if (!valid) out(s) = null
      else {
        var best = 0.0d
        var bestIdx = -1
        var j = 0
        while (j < cb.length) {
          val c = cb(j)
          // within one codebook every centroid has width w — dots all valid
          var acc = 0L
          var k = 0
          while (k < w) { acc += ve(k) * c(k); k += 1 }
          val score = acc.toDouble - halfs(j)
          if (bestIdx < 0 || score > best) { best = score; bestIdx = j }
          j += 1
        }
        out(s) = if (bestIdx < 0) null else bestIdx + 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** The ADC dot `dot_e12(qv, recon)` where `recon` is the concatenation
  * of each subspace's looked-up float centroid
  * (`concat(element_at(litFloat(cb_s), element_at(codes, s+1)))`) — as
  * one kernel, skipping the per-row concat allocation and per-pair
  * re-rounding. Long result in e12 units (callers cast to double),
  * null exactly when the tree form is null: null/short qv, a null
  * element, null codes, or a null code entry.
  */
case class PqAdcE12(qv: Expression, codes: Expression, books: Expression)
    extends TernaryExpression {
  override def first: Expression = qv
  override def second: Expression = codes
  override def third: Expression = books
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  // plan-string redaction of the codebook tensor (see SignBuckets)
  override def flatArguments: Iterator[Any] = Iterator(qv, codes)
  override protected def stringArgs: Iterator[Any] = Iterator(qv, codes)
  override def sql: String = s"$prettyName(${qv.sql}, ${codes.sql}, <books>)"

  override def checkInputDataTypes(): TypeCheckResult =
    (qv.dataType, codes.dataType, books.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _), bt)
          if PqKernelMath.booksTypeOk(bt) && books.foldable =>
        PqKernelMath.nonNullFoldable(books, "graft_pq_adc codebooks")
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_pq_adc expects (array<float>, array<int>, foldable " +
          s"array<array<array<double>>>), got (${qv.dataType}, ${codes.dataType}, " +
          s"${books.dataType}, foldable=${books.foldable})")
    }

  @transient lazy val kernel: PqAdcKernel = {
    val (e6s, _) = PqKernelMath.roundBooks(books)
    new PqAdcKernel(e6s)
  }

  override def eval(input: InternalRow): Any = {
    val q = qv.eval(input)
    val c = codes.eval(input)
    if (q == null || c == null) null
    else kernel.compute(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("pqAdcKernel", kernel, classOf[PqAdcKernel].getName)
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, (q, c, _) => s"""
      |java.lang.Long $boxed = $kRef.compute($q, $c);
      |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(qv = newFirst, codes = newSecond, books = newThird)
}

class PqAdcKernel(books: Array[Array[Array[Long]]]) extends Serializable {
  PqKernelMath.requireUniformWidths(books)
  private val m = books.length
  private val w = if (m > 0 && books(0).length > 0) books(0)(0).length else 0

  def compute(q: ArrayData, codes: ArrayData): java.lang.Long = {
    // recon length is m·w; a mismatched qv nulls the dot
    if (codes.numElements() < m || q.numElements() != m * w) return null
    var acc = 0L
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null // null code → null recon → null dot
      val code = codes.getInt(s)
      // codes are internally generated 1-based centroid ids: an
      // out-of-range value is CORRUPTION — fail loudly instead of
      // silently dropping the row from ADC ranking (r18 ADVICE; the
      // former tree under ANSI mode would have thrown here too)
      if (code < 1 || code > books(s).length) throw new IllegalStateException(
        s"graft_pq_adc: corrupt PQ code $code in subspace $s " +
          s"(valid range 1..${books(s).length})")
      val c = books(s)(code - 1)
      val base = s * w
      var i = 0
      while (i < w) {
        if (q.isNullAt(base + i)) return null
        acc += PqKernelMath.e6(q.getFloat(base + i)) * c(i)
        i += 1
      }
      s += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
