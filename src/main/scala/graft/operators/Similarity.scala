package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecFuncs

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * [[bruteForceTopK]] is the exact baseline: broadcast the (small)
  * query set against the corpus — linear in corpus size, no shuffle of
  * the corpus itself. [[lshTopK]] is the 100 TB path: random-hyperplane
  * signatures put vectors into buckets; candidates come from an
  * equi-join on the bucket key, and only candidates are exactly
  * reranked. Hyperplanes are generated from a fixed seed so results
  * are reproducible.
  */
object Similarity {

  /** Exact top-k neighbors per query vector (cosine, exact-decimal
    * intermediates; ties broken by neighbor id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    // norms are precomputed once per vector (not per pair) — same
    // exact-integer→double values, 1/3 of the per-pair work
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VecFuncs.normSqE12Native(col(vecCol)).cast("double").as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VecFuncs.normSqE12Native(col(vecCol)).cast("double").as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        VecFuncs.dotE12Native(col("qv"), col("cv")).cast("double") /
          sqrt(col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        floor(col("cos") * 1000d).cast("long").as("cos_e3"))
  }

  /** Deterministic random hyperplanes: `planes` × dim gaussian matrix. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket key (one int per `planes` set). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VecFuncs.dot(vec, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k via LSH bucketing + exact rerank of candidates only.
    * With b bucket bits the corpus shuffles once on the bucket key and
    * each query probes a ~2^-b fraction of the corpus. Recall is
    * tunable via numPlanes (fewer bits → more candidates → higher
    * recall).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    val planes = hyperplanes(numPlanes, dim)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), planes).as("bucket"),
      VecFuncs.normSqE12Native(col(vecCol)).cast("double").as("cn"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), planes).as("bucket"),
      VecFuncs.normSqE12Native(col(vecCol)).cast("double").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        VecFuncs.dotE12Native(col("qv"), col("cv")).cast("double") /
          sqrt(col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        floor(col("cos") * 1000d).cast("long").as("cos_e3"))
  }
}
