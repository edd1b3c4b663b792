package graft.plans

import org.apache.spark.sql.functions._

import graft.{GraftFunctions, SparkSpec}
import graft.functions.VecFuncs

class DotProductE12Spec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the HOF form bit-for-bit on random vectors") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(123)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong,
        Array.fill(64)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(4) - 1)).toFloat),
        Array.fill(64)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(4) - 1)).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
        VecFuncs.dotE12($"a", $"b").as("hof"),
        VecFuncs.dotE12Native($"a", $"b").as("native"))
      .where(!($"hof" <=> $"native"))
    assert(diff.count() == 0)
  }

  test("null semantics: length mismatch and null elements yield null, like zip_with") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Array(1f, 2f), Array(1f, 2f, 3f)),               // length mismatch
      (2L, Array(1f, 2f), Array(1f, 2f))                    // clean
    ).toDF("id", "a", "b")
    val out = df.select($"id", VecFuncs.dotE12Native($"a", $"b").as("d"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(5000000000000L)) // (1*1 + 2*2) in 1e-12 units
    // interpreted (non-codegen) path too
    val interpreted = DotProductE12.e6(1.5f)
    assert(interpreted == 1500000L)
    assert(DotProductE12.e6(-1.5f) == -1500000L)
  }
}
