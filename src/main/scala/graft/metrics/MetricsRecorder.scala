package graft.metrics

import java.util.concurrent.atomic.{AtomicLongArray, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Rows/bytes throughput telemetry (SURVEY.md §2 O6). The reference keeps
  * three hand-rolled rows/s time-series fed by racy global counters
  * (worker/worker.go:27-30) and reports a 10 s SLIDING-WINDOW rate over
  * them (source/stats.go:36-53); here one Spark listener aggregates task
  * metrics race-free, scoped per recorder attach/detach, and the sliding
  * window is a lock-free ring of per-second buckets — each bucket tagged
  * with the monotonic second it holds, so stale slots read as zero
  * instead of needing a sweeper thread.
  *
  * @param clockSec monotonic second supplier — injectable so the window
  *   arithmetic (bucket claim, wraparound, staleness) is spec-testable
  *   without sleeping. */
final class MetricsRecorder private (start: Long,
    clockSec: () => Long) extends SparkListener {
  import MetricsRecorder.WindowBuckets

  private val inRecords = new LongAdder
  private val inBytes = new LongAdder
  private val outRecords = new LongAdder
  private val outBytes = new LongAdder
  // sliding-window ring: bucketEpoch(i) names the second bucketRows(i)
  // currently accumulates; a reader trusts a slot only when the tag
  // matches the second it wants (source/stats.go's timeseries.Range)
  private val bucketRows = new AtomicLongArray(WindowBuckets)
  private val bucketEpoch = new AtomicLongArray(WindowBuckets)

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      inRecords.add(m.inputMetrics.recordsRead)
      inBytes.add(m.inputMetrics.bytesRead)
      outRecords.add(m.outputMetrics.recordsWritten)
      outBytes.add(m.outputMetrics.bytesWritten)
      recordWindow(m.inputMetrics.recordsRead)
    }
  }

  /** Credit `rows` to the current second's ring slot. Exposed to specs —
    * the listener path needs a live Spark task to produce TaskMetrics. */
  private[graft] def recordWindow(rows: Long): Unit = {
    val sec = clockSec()
    val i = math.floorMod(sec, WindowBuckets.toLong).toInt
    val tagged = bucketEpoch.get(i)
    if (tagged != sec) {
      // first writer of this second claims the slot; a lost race means
      // another writer already claimed it for the SAME second (the ring
      // is longer than any window, so no live second contends for a slot
      // with a different live second)
      if (bucketEpoch.compareAndSet(i, tagged, sec)) bucketRows.set(i, 0L)
    }
    bucketRows.addAndGet(i, rows): Unit
  }

  /** Rows/s over the trailing `windowSecs` seconds — the reference's
    * `Stats(statsWindow)` shape: amount in [now-window, now] / window. */
  def readRowsPerSecWindowed(windowSecs: Int = 10): Double = {
    val now = clockSec()
    val w = math.min(math.max(windowSecs, 1), WindowBuckets)
    var sum = 0L
    var k = 0
    while (k < w) {
      val sec = now - k
      val i = math.floorMod(sec, WindowBuckets.toLong).toInt
      if (bucketEpoch.get(i) == sec) sum += bucketRows.get(i)
      k += 1
    }
    sum.toDouble / w
  }

  def snapshot: MetricsRecorder.Snapshot = {
    val secs = math.max((System.nanoTime() - start) / 1e9, 1e-9)
    MetricsRecorder.Snapshot(
      inRecords.sum(), inBytes.sum(), outRecords.sum(), outBytes.sum(),
      inRecords.sum() / secs, outBytes.sum() / secs,
      readRowsPerSecWindowed())
  }
}

object MetricsRecorder {
  /** Ring length in seconds — must exceed the largest queried window so
    * two live seconds never share a slot. */
  private[metrics] val WindowBuckets = 64

  final case class Snapshot(rowsRead: Long, bytesRead: Long,
      rowsWritten: Long, bytesWritten: Long,
      readRowsPerSec: Double, writeBytesPerSec: Double,
      readRowsPerSec10s: Double)

  def attach(spark: SparkSession): MetricsRecorder = {
    val r = new MetricsRecorder(System.nanoTime(),
      () => System.nanoTime() / 1000000000L)
    spark.sparkContext.addSparkListener(r)
    r
  }

  /** Spec entry: a recorder on an injected clock, not listening to any
    * SparkContext. */
  private[graft] def forClock(clockSec: () => Long): MetricsRecorder =
    new MetricsRecorder(System.nanoTime(), clockSec)

  def detach(spark: SparkSession, r: MetricsRecorder): Unit =
    spark.sparkContext.removeSparkListener(r)
}
