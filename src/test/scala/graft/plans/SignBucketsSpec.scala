package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VecFuncs
import graft.operators.Similarity

class SignBucketsSpec extends SparkSpec {
  import spark.implicits._

  private def hofBuckets(vec: org.apache.spark.sql.Column,
                         tables: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column = {
    // the pre-native reference form: nested HOFs over the plane tensor
    val bitValues = typedLit(tables.head.indices.map(i => 1L << i))
    transform(typedLit(tables), table =>
      aggregate(
        zip_with(table, bitValues, (p, bit) =>
          when(VecFuncs.dot(vec, p) >= 0, bit).otherwise(lit(0L))),
        lit(0L), (acc, v) => acc + v))
  }

  test("native graft_sign_buckets == the HOF reference form on random vectors") {
    graft.GraftFunctions.register(spark)
    val tables = Similarity.planeTables(numTables = 4, planesPerTable = 6, dim = 16, seed = 9L)
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 50L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    val both = vecs.select(col("id"),
        Similarity.tableBuckets(col("v"), tables).as("native"),
        hofBuckets(col("v"), tables).as("hof"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    both.foreach { case (id, n, h) => assert(n == h, s"vector $id") }
    // buckets actually spread (not all equal → planes are being used)
    assert(both.map(_._2).distinct.size > 1)
  }

  test("null vector yields null; codegen and interpreted agree") {
    graft.GraftFunctions.register(spark)
    val tables = Similarity.planeTables(2, 4, 4, seed = 1L)
    val df = Seq((1L, Some(Array(1f, -2f, 3f, -4f))), (2L, None))
      .toDF("id", "v")
    val out = df.select(col("id"), Similarity.tableBuckets(col("v"), tables).as("b"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(out(2L) == null)
    assert(out(1L) != null && out(1L).size == 2)
  }
}
