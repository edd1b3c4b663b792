package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{GraftFunctions, SparkSpec}
import graft.functions.VecFuncs

/** The PQ/IVF kernels are EXACT replacements for expression trees the
  * operators used to build inline — these tests pin bit-for-bit
  * equality against those trees (reconstructed here), including the
  * null algebra (null elements, short vectors, null codes).
  */
class PqKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)
  private def centroid(dim: Int): Seq[Double] =
    Seq.fill(dim)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(3) - 1))

  // ---- the former tree forms, verbatim ----------------------------------

  private def argmaxTree(vec: Column, cents: Seq[Seq[Double]]): Column = {
    val d = array(cents.map(c =>
      VecFuncs.dotE12Native(vec, typedLit(c.map(_.toFloat))).cast("double")): _*)
    array_position(d, array_max(d)).cast("int")
  }

  private def codesTree(nv: Column, books: Seq[Seq[Seq[Double]]], w: Int): Column =
    array(books.zipWithIndex.map { case (cb, sub) =>
      val scores = array(cb.map(c =>
        VecFuncs.dotE12Native(slice(nv, sub * w + 1, w), typedLit(c.map(_.toFloat)))
          .cast("double") - lit(c.map(x => x * x).sum / 2 * 1e12)): _*)
      array_position(scores, array_max(scores)).cast("int")
    }: _*)

  private def adcTree(qv: Column, codes: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val recon = concat(books.zipWithIndex.map { case (cb, sub) =>
      element_at(typedLit(cb.map(_.map(_.toFloat))), element_at(codes, sub + 1))
    }: _*)
    VecFuncs.dotE12Native(qv, recon)
  }

  /** vecs of width `dim` plus the edge rows: a short vector, a NULL
    * vector, and one with a null element.
    */
  private def vecFrame(dim: Int, n: Int): DataFrame = {
    val rows = Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val edges = spark.range(1).selectExpr(
        "9001L as id", "array(cast(1.0 as float), cast(2.0 as float)) as v")
      .union(spark.range(1).selectExpr("9002L as id", "cast(null as array<float>) as v"))
      .union(spark.range(1).selectExpr("9003L as id",
        s"array(cast(1.0 as float), cast(null as float)${", cast(0.5 as float)" * (dim - 2)}) as v"))
    rows.toDF("id", "v").union(edges)
  }

  private def assertNoDiff(df: DataFrame, tree: Column, kernel: Column): Unit = {
    val diff = df.select(tree.as("tree"), kernel.as("kernel"))
      .where(!(col("tree") <=> col("kernel")))
    assert(diff.count() == 0)
  }

  // -----------------------------------------------------------------------

  test("graft_argmax_dots matches the array_position/array_max tree, incl nulls") {
    GraftFunctions.register(spark)
    val cents = Seq.fill(16)(centroid(8))
    assertNoDiff(vecFrame(8, 300),
      argmaxTree(col("v"), cents),
      call_function("graft_argmax_dots", col("v"), typedLit(cents)))
  }

  test("graft_argmax_dots ties break to the FIRST max, like array_position") {
    GraftFunctions.register(spark)
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0)) // 1 and 3 tie
    val out = Seq((1L, Array(2f, 0f))).toDF("id", "v")
      .select(call_function("graft_argmax_dots", col("v"), typedLit(cents)))
      .collect()(0).getInt(0)
    assert(out == 1)
  }

  test("graft_pq_codes matches the per-subspace argmax tree, incl nulls") {
    GraftFunctions.register(spark)
    val m = 4; val w = 4; val k = 8
    val books = Seq.fill(m)(Seq.fill(k)(centroid(w)))
    assertNoDiff(vecFrame(m * w, 300),
      codesTree(col("v"), books, w),
      call_function("graft_pq_codes", col("v"), typedLit(books)))
  }

  test("graft_pq_adc matches the concat/element_at reconstruction dot, incl nulls") {
    GraftFunctions.register(spark)
    val m = 4; val w = 4; val k = 8
    val books = Seq.fill(m)(Seq.fill(k)(centroid(w)))
    val rows = Seq.tabulate(300) { i =>
      (i.toLong, Array.fill(m * w)(rnd.nextGaussian().toFloat),
        Array.fill(m)(rnd.nextInt(k) + 1))
    }
    val vecSql = s"array(${Seq.fill(m * w)("cast(1.0 as float)").mkString(",")})"
    val edges = spark.range(1).selectExpr(
        "9001L as id", "array(cast(1.0 as float), cast(2.0 as float)) as qv",
        "array(1, 2, 3, 4) as codes")                              // short qv
      .union(spark.range(1).selectExpr("9002L as id",
        "cast(null as array<float>) as qv", "array(1, 2, 3, 4) as codes"))
      .union(spark.range(1).selectExpr("9003L as id",
        s"$vecSql as qv", "cast(null as array<int>) as codes"))    // null codes
      .union(spark.range(1).selectExpr("9004L as id",
        s"$vecSql as qv", "array(1, cast(null as int), 3, 4) as codes")) // null entry
    val base = rows.toDF("id", "qv", "codes").union(edges)
    assertNoDiff(base,
      adcTree(col("qv"), col("codes"), books),
      call_function("graft_pq_adc", col("qv"), col("codes"), typedLit(books)))
  }

  test("kernels survive the interpreted (non-codegen) path too") {
    GraftFunctions.register(spark)
    val conf = spark.conf
    val before = (conf.get("spark.sql.codegen.wholeStage", "true"),
      conf.get("spark.sql.codegen.factoryMode", "FALLBACK"))
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val cents = Seq.fill(4)(centroid(4))
      val books = Seq.fill(2)(Seq.fill(4)(centroid(2)))
      val df = Seq((1L, Array.fill(4)(0.5f), Array(1, 2))).toDF("id", "v", "codes")
      val kern = df.select(
        call_function("graft_argmax_dots", col("v"), typedLit(cents)).as("a"),
        call_function("graft_pq_codes", col("v"), typedLit(books)).as("c"),
        call_function("graft_pq_adc", col("v"), col("codes"), typedLit(books)).as("d"))
        .collect()(0)
      val tree = df.select(
        argmaxTree(col("v"), cents).as("a"),
        codesTree(col("v"), books, 2).as("c"),
        adcTree(col("v"), col("codes"), books).as("d"))
        .collect()(0)
      assert(kern == tree)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", before._1)
      conf.set("spark.sql.codegen.factoryMode", before._2)
    }
  }

  // ---- r19 hardening (r18 ADVICE items) ---------------------------------

  test("corrupt (out-of-range) PQ codes fail loudly instead of silently dropping rows") {
    GraftFunctions.register(spark)
    val books = Seq.fill(2)(Seq.fill(4)(centroid(2)))
    val df = Seq((1L, Array.fill(4)(0.5f), Array(1, 99))).toDF("id", "v", "codes")
    val e = intercept[Exception] {
      df.select(call_function("graft_pq_adc", col("v"), col("codes"),
        typedLit(books))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("corrupt PQ code"))),
      s"expected a 'corrupt PQ code' failure, got $e")
    // NULL code entries keep the tree form's null algebra (null dot)
    val ok = Seq((1L, Array.fill(4)(0.5f))).toDF("id", "v")
      .selectExpr("v", "array(1, cast(null as int)) as codes")
      .select(call_function("graft_pq_adc", col("v"), col("codes"),
        typedLit(books))).collect()(0)
    assert(ok.isNullAt(0))
  }

  test("a typed NULL literal tensor is rejected at analysis, not an NPE at planning") {
    GraftFunctions.register(spark)
    val df = Seq((1L, Array.fill(4)(0.5f))).toDF("id", "v")
    Seq(
      "graft_argmax_dots(v, cast(null as array<array<double>>))",
      "graft_pq_codes(v, cast(null as array<array<array<double>>>))",
      "graft_pq_adc(v, array(1), cast(null as array<array<array<double>>>))"
    ).foreach { exprSql =>
      val e = intercept[Exception] { df.selectExpr(exprSql).collect() }
      assert(!e.isInstanceOf[NullPointerException],
        s"$exprSql NPE'd instead of failing analysis")
    }
  }

  test("non-uniform codebook widths are rejected loudly") {
    GraftFunctions.register(spark)
    val books = Seq(Seq.fill(4)(centroid(2)), Seq.fill(4)(centroid(3)))
    val df = Seq((1L, Array.fill(5)(0.5f), Array(1, 2))).toDF("id", "v", "codes")
    val e = intercept[Exception] {
      df.select(call_function("graft_pq_adc", col("v"), col("codes"),
        typedLit(books))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("uniform subspace width"))), s"got $e")
  }
}
