package graft.metrics

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Rows/bytes throughput telemetry (SURVEY.md §2 O6). The reference keeps
  * three hand-rolled rows/s time-series fed by racy global counters
  * (worker/worker.go:27-30); here one Spark listener aggregates task
  * metrics race-free, scoped per recorder attach/detach. */
final class MetricsRecorder private (start: Long) extends SparkListener {
  private val inRecords = new LongAdder
  private val inBytes = new LongAdder
  private val outRecords = new LongAdder
  private val outBytes = new LongAdder

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      inRecords.add(m.inputMetrics.recordsRead)
      inBytes.add(m.inputMetrics.bytesRead)
      outRecords.add(m.outputMetrics.recordsWritten)
      outBytes.add(m.outputMetrics.bytesWritten)
    }
  }

  def snapshot: MetricsRecorder.Snapshot = {
    val secs = math.max((System.nanoTime() - start) / 1e9, 1e-9)
    MetricsRecorder.Snapshot(
      inRecords.sum(), inBytes.sum(), outRecords.sum(), outBytes.sum(),
      inRecords.sum() / secs, outBytes.sum() / secs)
  }
}

object MetricsRecorder {
  final case class Snapshot(rowsRead: Long, bytesRead: Long,
      rowsWritten: Long, bytesWritten: Long,
      readRowsPerSec: Double, writeBytesPerSec: Double)

  def attach(spark: SparkSession): MetricsRecorder = {
    val r = new MetricsRecorder(System.nanoTime())
    spark.sparkContext.addSparkListener(r)
    r
  }

  def detach(spark: SparkSession, r: MetricsRecorder): Unit =
    spark.sparkContext.removeSparkListener(r)
}
