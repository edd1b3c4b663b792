package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StructType

import graft.operators.{Scd1, Scd2}

/** Structured-Streaming re-expression of the reference's "real-time"
  * machinery:
  *
  *  - stage ingest + append-only stream → [[auditedCsvStream]]
  *    (file-source stream with the reference's audit columns;
  *    ref `/root/reference/02 Location Entity.sql:70-104`)
  *  - scheduled MERGE task loop → [[scd1UpsertSink]]
  *    (`foreachBatch` + [[Scd1.merge]]; ref `with procedures/
  *    task_proc.sql:32-40` — the cron task becomes a trigger)
  *  - standard stream (I/U/D change tracking) → [[changeLog]]
  *    (`flatMapGroupsWithState` keyed change emitter; ref
  *    `02 Location Entity.sql:86-90`)
  *  - consumption-layer rollups → [[windowedCounts]]
  *    (watermarked tumbling windows)
  *
  * Scale notes: the upsert sink demonstrates the merge loop against a
  * plain parquet target (read-merge-swap); on a cluster the target
  * would be a transactional table format (Delta/Iceberg MERGE) — the
  * stream-side logic is identical. State in [[changeLog]] is one small
  * value per key, partitioned by the grouping key across executors.
  */
object StreamPipeline {

  /** Schema-on-read staged CSV ingest with audit columns. */
  def auditedCsvStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).option("header", "true").csv(path)
      .withColumn("_stg_file_name", input_file_name())
      .withColumn("_copy_data_ts", current_timestamp())

  /** Watermarked tumbling-window event rollup. */
  def windowedCounts(events: DataFrame, tsCol: String,
                     watermark: String, windowLen: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Continuous SCD1 upsert: every micro-batch merges into the parquet
    * target, newest version per key wins (the reference's
    * stream-driven clean-layer MERGE).
    */
  def scd1UpsertSink(stream: DataFrame, targetDir: String, checkpointDir: String,
                     keys: Seq[String], orderBy: Seq[Column]): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        upsertBatch(batch, targetDir, keys, orderBy)
      }
      .start()

  /** One merge step (also usable from a batch job): read target, SCD1
    * merge, write to a temp dir, swap. Swap is what a table format
    * would make transactional.
    */
  def upsertBatch(batch: Dataset[Row], targetDir: String,
                  keys: Seq[String], orderBy: Seq[Column]): Unit = {
    val spark = batch.sparkSession
    val target = Paths.get(targetDir)
    // dedup within the batch too — one micro-batch can carry several
    // versions of the same key (e.g. multiple staged files at once)
    val merged =
      if (Files.exists(target))
        Scd1.merge(spark.read.parquet(targetDir), batch.toDF(), keys, orderBy)
      else Scd1.latestByKey(batch.toDF(), keys, orderBy)
    val tmp = targetDir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    deleteRecursively(target)
    Files.move(Paths.get(tmp), target)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    }

  /** Stream–stream interval join: match right-stream rows to left
    * rows with the same key whose event time falls within
    * [leftTs − within, leftTs]. Watermarks on both sides bound the
    * join state (Spark drops buffered rows once they cannot match).
    */
  def intervalStreamJoin(left: DataFrame, right: DataFrame,
                         key: String, leftTs: String, rightTs: String,
                         watermark: String, withinSeconds: Long): DataFrame = {
    require(leftTs != rightTs, "left/right event-time columns must have distinct names")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
      .withColumnRenamed(key, s"__r_$key")
    l.join(r, expr(
        s"""$key = __r_$key AND
           |$rightTs >= $leftTs - INTERVAL $withinSeconds SECONDS AND
           |$rightTs <= $leftTs""".stripMargin))
      .drop(s"__r_$key")
  }

  /** Continuous SCD2 maintenance: every micro-batch re-derives the
    * effective-dated history with the new versions appended (the
    * reference's stream-driven consumption-layer dim MERGE).
    */
  def scd2HistorySink(stream: DataFrame, targetDir: String, checkpointDir: String,
                      keys: Seq[String], ts: String, tiebreak: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val target = Paths.get(targetDir)
        val history =
          if (Files.exists(target))
            Scd2.applyDelta(spark.read.parquet(targetDir), batch.toDF(), keys, ts, tiebreak)
          else Scd2.buildHistory(batch.toDF(), keys, ts, tiebreak)
        val tmp = targetDir + ".tmp"
        history.write.mode("overwrite").parquet(tmp)
        deleteRecursively(target)
        Files.move(Paths.get(tmp), target)
        ()
      }
      .start()

  /** Streaming exact dedup: drop repeated ids inside the watermark
    * horizon (state is bounded by the watermark — the streaming twin
    * of [[graft.operators.Dedup.exactDupFlags]]'s keep-first policy).
    */
  def dedupWithinWatermark(stream: DataFrame, idCol: String, tsCol: String,
                           watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** A keyed change record emitted by [[changeLog]]. */
  final case class KeyChange(key: Long, action: String, old_value: String, new_value: String)

  /** Standard-stream analog: stateful per-key change tracking. Emits
    * ('I', null, v) the first time a key appears and ('U', prev, v) on
    * every subsequent change; unchanged updates emit nothing.
    */
  def changeLog(updates: Dataset[(Long, String)]): Dataset[KeyChange] = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates.groupByKey(_._1)
      .flatMapGroupsWithState[String, KeyChange](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[String]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[KeyChange]
          var cur = state.getOption
          rows.foreach { case (_, v) =>
            cur match {
              case None => out += KeyChange(key, "I", null, v)
              case Some(prev) if prev != v => out += KeyChange(key, "U", prev, v)
              case _ => ()
            }
            cur = Some(v)
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
