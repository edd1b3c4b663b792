package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import org.apache.spark.sql.functions.{lit, when}
import graft.SparkSpec
import DriftMonitor._

/** PSI drift monitoring: a same-distribution batch scores near zero, a
  * shifted one crosses the alert threshold, and the per-batch cost is
  * one nbins-cell aggregation.
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  // deterministic "quality scores": hash-spread values in [0, 1000)
  private def scores(ids: Range, shift: Double = 0d) =
    ids.map(i => (i.toLong, (math.abs((i * 2654435761L) % 1000L)).toDouble + shift))
      .toDF("id", "score")

  test("referenceOf: decile bins partition the data; shares sum to 1; null bin last") {
    val ref = referenceOf(scores(0 until 2000), "score", bins = 10)
    assert(ref.boundaries.size == 9 && ref.shares.size == 11)
    assert(math.abs(ref.shares.sum - 1d) < 1e-9)
    // equi-population training: every value decile holds ~10%; the
    // all-values fixture has an empty null bin
    ref.shares.init.foreach(s => assert(s > 0.05 && s < 0.15, s"share $s"))
    assert(ref.shares.last == 0d)
  }

  test("psi: same distribution ~0, shifted distribution alerts, empty batch is 0") {
    val ref = referenceOf(scores(0 until 2000), "score", bins = 10)
    val same = binCounts(scores(2000 until 4000), "score", ref.boundaries)
    assert(psi(ref, same) < 0.05, s"stable psi = ${psi(ref, same)}")
    // shift the whole distribution up by half its range
    val shifted = binCounts(scores(2000 until 4000, shift = 500d), "score", ref.boundaries)
    assert(psi(ref, shifted) > 0.25, s"shifted psi = ${psi(ref, shifted)}")
    // a degenerate collapse (every value in one bin) is extreme drift
    val collapsed = binCounts(Seq.fill(100)((1L, 5d)).toDF("id", "score"),
      "score", ref.boundaries)
    assert(psi(ref, collapsed) > 1.0)
    assert(psi(ref, Seq.fill(11)(0L)) == 0d)
    // null scores land in the dedicated LAST bin — a feed degrading
    // into nulls is drift, not invisible
    val withNulls = Seq((1L, Some(5d)), (2L, None), (3L, Some(999d)))
      .toDF("id", "score")
    val nc = binCounts(withNulls, "score", ref.boundaries)
    assert(nc.sum == 3 && nc.last == 1)
    // 90% of the feed going null alerts even when surviving values
    // keep the reference distribution
    val mostlyNull = scores(0 until 200).select($"id",
      when($"id" % 10 === 0, $"score").otherwise(lit(null)).as("score"))
    assert(psi(ref, binCounts(mostlyNull, "score", ref.boundaries)) > 0.25)
  }

  test("driftSink: reports every batch, alerts only on the drifted one") {
    val ref = referenceOf(scores(0 until 2000), "score", bins = 10)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    var reports = List.empty[(Long, Double)]
    var alerts = List.empty[Long]
    val q = driftSink(mem.toDF().toDF("id", "score"),
      Files.createTempDirectory("graft-drift").toString, "score", ref,
      threshold = 0.25,
      onReport = (b, p, _) => reports ::= (b, p),
      onDrift = (b, _) => alerts ::= b)
    try {
      mem.addData(scores(2000 until 3000).as[(Long, Double)].collect().toSeq)
      q.processAllAvailable()
      mem.addData(scores(3000 until 4000, shift = 700d)
        .as[(Long, Double)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(reports.size == 2)
    assert(alerts == List(1L), s"alerts=$alerts reports=$reports")
    val byBatch = reports.toMap
    assert(byBatch(0L) < 0.1 && byBatch(1L) > 0.25)
  }
}
