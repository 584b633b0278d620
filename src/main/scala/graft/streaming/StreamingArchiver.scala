package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sink.StagedLoader

/** Structured Streaming flavor of the time-split path (SURVEY.md §2.10 — a
  * flagged upgrade, not reference parity): the batch engine steps tumbling
  * windows itself; the streaming engine gets the same semantics from
  * `window()` + a watermark, and `batchMaxInterval` becomes the micro-batch
  * trigger. The reference's immutable-range assumption (it refuses
  * maxThread>1 and warns about mutable data) maps to watermark=0 — late
  * data is not expected.
  */
object StreamingArchiver {

  /** Tumbling-window rows-per-window counts over a streaming source — the
    * streaming analogue of P5 window planning + per-window counting. */
  def windowedCounts(events: DataFrame, timeCol: String, width: String,
      watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), width))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
              col("window.end").as("win_end"), col("n"))

  /** Micro-batch archive: every trigger interval, stage the new batch as
    * NDJSON and append it through the same loader the batch path uses
    * (foreachBatch = the COPY-INTO loop with Spark managing offsets). */
  def archiveStream(stream: DataFrame, loader: StagedLoader,
      stagingRoot: String, checkpoint: String,
      triggerInterval: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        loader.ingest(batch, s"$stagingRoot/batch-$id"): Unit
      }
    triggerInterval
      .fold(writer.trigger(Trigger.AvailableNow()))(
        i => writer.trigger(Trigger.ProcessingTime(i)))
      .start()
  }
}
