package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Distribution-drift monitoring for a streaming pipeline — the ops
  * guard a training-data feed needs: a quality signal (score, length,
  * language share, …) whose distribution silently shifts upstream
  * poisons every batch shipped after it. The monitor bins a numeric
  * column against a FROZEN reference histogram and raises the
  * Population Stability Index per micro-batch:
  *
  *   PSI = Σᵢ (pᵢ − qᵢ) · ln(pᵢ / qᵢ)
  *
  * (pᵢ = batch share in bin i, qᵢ = reference share; the standard
  * scorecard-monitoring statistic — by convention < 0.1 is stable,
  * 0.1–0.25 drifting, > 0.25 shifted.)
  *
  * Scale design: the reference histogram is trained ONCE (one
  * `approxQuantile` pass, decile boundaries + shares — metadata) and
  * broadcast as a literal CASE expression; per batch the monitor runs
  * ONE narrow aggregation (nbins counting cells, map-side combined),
  * collects nbins longs, and computes PSI on the driver. No state
  * store, no per-key state — stream volume only ever crosses the
  * counting aggregate.
  */
object DriftMonitor {

  /** A frozen reference: interior bin boundaries (b₁ < … < b_{k−1},
    * defining k VALUE bins over (−∞,b₁), [b₁,b₂), …, [b_{k−1},∞))
    * plus one NULL bin (null/NaN rows — a feed degrading into nulls
    * is itself drift, and a monitor that dropped them would report
    * "stable" while 90% of the signal vanished). `shares` has
    * k + 1 entries, the null bin LAST. Metadata-sized; serialize it
    * wherever config lives.
    */
  final case class Reference(boundaries: Seq[Double], shares: Seq[Double]) {
    require(boundaries == boundaries.sorted && boundaries.distinct == boundaries,
      "boundaries must be strictly increasing")
    require(shares.size == boundaries.size + 2,
      s"${boundaries.size} boundaries define ${boundaries.size + 1} value bins " +
        s"+ 1 null bin, got ${shares.size} shares")
  }

  /** Train a [[Reference]] on a batch frame: `bins` equi-population
    * buckets from one distributed `approxQuantile` pass (boundaries
    * deduped — a heavily repeated value may merge bins), then one
    * aggregation for the exact shares (null bin included) under those
    * boundaries.
    */
  def referenceOf(df: DataFrame, valueCol: String, bins: Int = 10,
                  relativeError: Double = 0.001): Reference = {
    require(bins >= 2, "need at least two bins")
    val probes = (1 until bins).map(_.toDouble / bins).toArray
    val bounds = df.na.drop(Seq(valueCol))
      .stat.approxQuantile(valueCol, probes, relativeError)
      .distinct.sorted.toSeq
    val counts = binCounts(df, valueCol, bounds)
    val total = counts.sum.toDouble.max(1d)
    Reference(bounds, counts.map(_ / total))
  }

  /** The literal bin id (0-based) of `c` under `bounds`, with
    * null/NaN routed to the LAST bin — a chained CASE over
    * metadata-sized boundaries, fully codegen'd.
    */
  private def binId(c: Column, bounds: Seq[Double]): Column =
    when(c.isNull || c.isNaN, lit(bounds.size + 1)).otherwise(
      bounds.zipWithIndex.foldRight(lit(bounds.size)) { case ((b, i), rest) =>
        when(c < b, lit(i)).otherwise(rest)
      })

  /** Per-bin row counts of `df[valueCol]` — nbins value bins plus the
    * null/NaN bin LAST: ONE narrow aggregation collecting exactly
    * nbins + 1 longs.
    */
  def binCounts(df: DataFrame, valueCol: String, bounds: Seq[Double]): Seq[Long] = {
    val n = bounds.size + 2
    val got = df
      .groupBy(binId(col(valueCol).cast("double"), bounds).as("__bin"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until n).map(got.getOrElse(_, 0L))
  }

  /** PSI of observed bin counts vs the reference shares (null bin a
    * first-class bin: a null-rate regression alerts like any other
    * shift). Empty bins on either side are Laplace-smoothed
    * (ε = 1e-4) — the conventional guard against ln(0) — so a bin
    * going from tiny to zero reads as strong-but-finite drift.
    */
  def psi(ref: Reference, counts: Seq[Long]): Double = {
    require(counts.size == ref.shares.size,
      s"expected ${ref.shares.size} bins, got ${counts.size}")
    val eps = 1e-4
    val total = counts.sum.toDouble
    if (total == 0) return 0d // an empty batch carries no evidence
    ref.shares.zip(counts).map { case (q0, c) =>
      val p = (c / total).max(eps)
      val q = q0.max(eps)
      (p - q) * math.log(p / q)
    }.sum
  }

  /** Attach the monitor to a stream: per micro-batch, one counting
    * aggregate → PSI → `onReport(batchId, psi, counts)`; `onDrift`
    * additionally fires when PSI crosses `threshold`. Pure
    * observation — the stream's data path is whatever the caller
    * builds downstream; this sink only watches.
    */
  def driftSink(stream: DataFrame, checkpointDir: String, valueCol: String,
                ref: Reference, threshold: Double = 0.25,
                onReport: (Long, Double, Seq[Long]) => Unit = (_, _, _) => (),
                onDrift: (Long, Double) => Unit = (_, _) => ()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val counts = binCounts(batch.toDF(), valueCol, ref.boundaries)
        val score = psi(ref, counts)
        onReport(batchId, score, counts)
        if (score > threshold) onDrift(batchId, score)
      }
      .start()
}
