package graft

import org.apache.spark.sql.functions._

class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 60L)
    .map(i => (i, Seq.fill((i % 5 + 1).toInt)("tok").mkString(" ")))
    .toDF("doc_id", "text")

  test("seqPack shard count is a parameter; default derives from defaultParallelism") {
    val dflt = QueriesData.seqPack(docs)
    val expected = spark.sparkContext.defaultParallelism.toLong
    assert(dflt.agg(countDistinct(col("shard"))).as[Long].head() <= expected)
    assert(dflt.agg(max(col("shard"))).as[Long].head() < expected)

    // an explicit non-default count caps the shard domain accordingly
    val three = QueriesData.seqPack(docs, shards = 3)
    assert(three.agg(max(col("shard"))).as[Long].head() < 3L)

    // packing invariant at ANY shard count: within a shard, offsets are
    // the exact prefix sums of token counts in doc_id order
    Seq(3, 12).foreach { n =>
      QueriesData.seqPack(docs, shards = n)
        .select("shard", "doc_id", "n_tokens", "start_offset")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).values.foreach { rows =>
          var expectedOff = 0L
          rows.sortBy(_._2).foreach { case (_, _, nt, off) =>
            assert(off == expectedOff)
            expectedOff += nt
          }
        }
    }
  }
}
