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

  /** ANN top-k via multi-table, multi-probe LSH + exact rerank of
    * candidates only.
    *
    * Recall engineering (single-table sign-LSH recall is poor — a
    * near neighbor missing ONE bucket bit is lost forever):
    *  - `numTables` independent hyperplane sets; a neighbor is a
    *    candidate if it collides in ANY table (union of candidates,
    *    1−(1−p^n)^L recall).
    *  - 1-bit multi-probe on the query side (`probeBits = 1`): each
    *    query also probes every bucket at hamming distance 1, lifting
    *    per-table collision from p^n to p^n + n·p^(n-1)(1−p). Fan-out
    *    is on the (tiny, broadcast) query side only.
    *  - degenerate-bucket cap: corpus buckets larger than
    *    `maxBucketSize` are skipped — at 100 TB a hot bucket would
    *    otherwise re-create the brute-force scan for every query that
    *    hashes into it (those vectors are still reachable through the
    *    other L−1 tables).
    *
    * Plan shape: corpus fans out ×numTables into (table, bucket) rows;
    * candidates come from an equi-join on (table_idx, bucket) against
    * the broadcast probe set; ONLY the distinct candidate id-pairs are
    * then joined back to the vectors for the exact cosine rerank — no
    * vector ever rides the bucket fan-out shuffle.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numTables: Int = 12, planesPerTable: Int = 6, dim: Int = 64,
              probeBits: Int = 1, maxBucketSize: Long = 1L << 20): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    val tables = (0 until numTables)
      .map(t => hyperplanes(planesPerTable, dim, seed = 42L + t))
    // all tables' buckets in ONE nested-HOF expression (3 codegen'd
    // loops) — building numTables×planesPerTable separate aggregate
    // subtrees instead makes planning+codegen the dominant cost
    val bitValues = typedLit((0 until planesPerTable).map(i => 1L << i))
    def tableBuckets(vec: Column): Column =
      transform(typedLit(tables), table =>
        aggregate(
          zip_with(table, bitValues, (p, bit) =>
            when(VecFuncs.dot(vec, p) >= 0, bit).otherwise(lit(0L))),
          lit(0L), (acc, v) => acc + v))

    val c = corpus.select(col(idCol).as("neighbor_id"),
        posexplode(tableBuckets(col(vecCol))).as(Seq("table_idx", "bucket")))
    // query probes: the exact bucket plus every 1-bit flip of it
    def probeSet(b: Column): Column =
      if (probeBits < 1) array(b)
      else array(b +: (0 until planesPerTable).map(i => b.bitwiseXOR(lit(1L << i))): _*)
    val probes = queries.select(col(idCol).as("query_id"),
        posexplode(tableBuckets(col(vecCol))).as(Seq("table_idx", "bucket0")))
      .select(col("query_id"), col("table_idx"),
        explode(probeSet(col("bucket0"))).as("bucket"))

    val keptBuckets = c.groupBy(col("table_idx"), col("bucket"))
      .agg(count(lit(1)).as("__bsz"))
      .where(col("__bsz") <= maxBucketSize)
      .select("table_idx", "bucket")
    val cand = c.join(keptBuckets, Seq("table_idx", "bucket"), "left_semi")
      .join(broadcast(probes), Seq("table_idx", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()

    // exact rerank of the candidate pairs only
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VecFuncs.normSqE12Native(col(vecCol)).cast("double").as("cn"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VecFuncs.normSqE12Native(col(vecCol)).cast("double").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos",
        VecFuncs.dotE12Native(col("qv"), col("cv")).cast("double") /
          sqrt(col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        floor(col("cos") * 1000d).cast("long").as("cos_e3"))
  }
}
