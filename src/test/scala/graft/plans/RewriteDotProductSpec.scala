package graft.plans

import graft.SparkSpec
import graft.functions.VecFuncs

class RewriteDotProductSpec extends SparkSpec {
  import spark.implicits._

  test("optimizer rule rewrites the HOF dot pattern to the native expression") {
    val df = Seq((1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)))
      .toDF("id", "a", "b")

    // matcher applies on the analyzed plan
    val hof = df.select(VecFuncs.dotE12($"a", $"b").as("d"))
    val rewritten = RewriteDotProduct(hof.queryExecution.analyzed)
    assert(rewritten.expressions.exists(_.exists(_.isInstanceOf[DotProductE12])))

    // installed in the session optimizer, values are unchanged.
    // (parquet-backed input: ConvertToLocalRelation would eagerly
    // evaluate a projection over a local Seq before extra rules run)
    val dir = java.nio.file.Files.createTempDirectory("graft_rw").toString
    df.write.mode("overwrite").parquet(dir)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteDotProduct
    try {
      val out = spark.read.parquet(dir).select(VecFuncs.dotE12($"a", $"b").as("d"))
      assert(out.queryExecution.optimizedPlan
        .expressions.exists(_.exists(_.isInstanceOf[DotProductE12])))
      assert(out.as[Long].head() == (4L + 10L + 18L) * 1000000000000L)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
    }
  }

  test("rule leaves non-matching aggregates untouched") {
    val df = Seq((1L, Array(1f, 2f), Array(3f, 4f))).toDF("id", "a", "b")
    // a plain double dot (no e6 quantization) must NOT match
    val other = df.select(VecFuncs.dot($"a", $"b").as("d"))
    val rewritten = RewriteDotProduct(other.queryExecution.analyzed)
    assert(!rewritten.expressions.exists(_.exists(_.isInstanceOf[DotProductE12])))
    assert(other.as[Double].head() == 11.0)
  }
}
