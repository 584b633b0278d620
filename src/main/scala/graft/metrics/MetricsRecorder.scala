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
  // sliding-window ring, one WORD per slot: epoch tag (high 24 bits,
  // second mod 2^24) + row count (low 40 bits), so claim-and-reset and
  // read are each a single atomic op. Two words per slot had a lost-update
  // race: writer A CASes the epoch to the new second, writer B (same
  // second) adds its rows, then A's count reset wipes B's contribution —
  // and a reader between A's two writes attributed the wrapped second's
  // rows to the new one. The 24-bit tag wraps at ~194 days (the 64 s ring
  // means no two LIVE seconds collide; a stale 194-day-old tag match is
  // telemetry noise, not state); the 40-bit count saturates at ~1.1e12
  // rows per second per slot. (source/stats.go's timeseries.Range)
  private val slots = new AtomicLongArray(WindowBuckets)

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
    val tag = sec & MetricsRecorder.EpochMask
    var done = false
    while (!done) {
      val cur = slots.get(i)
      val next =
        if ((cur >>> MetricsRecorder.CountBits) == tag)
          // same second: saturating add within the packed count field
          (cur & ~MetricsRecorder.CountMask) |
            math.min((cur & MetricsRecorder.CountMask) + rows,
              MetricsRecorder.CountMask)
        else // new second claims the slot: tag + this write's rows, one CAS
          (tag << MetricsRecorder.CountBits) |
            math.min(rows, MetricsRecorder.CountMask)
      done = slots.compareAndSet(i, cur, next)
    }
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
      val cur = slots.get(i) // one-word read: tag and count are coherent
      if ((cur >>> MetricsRecorder.CountBits) == (sec & MetricsRecorder.EpochMask))
        sum += cur & MetricsRecorder.CountMask
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
  /** Packed-slot layout: low CountBits = row count, high bits = second
    * tag (mod 2^(64-CountBits)). */
  private[metrics] val CountBits = 40
  private[metrics] val CountMask = (1L << CountBits) - 1
  private[metrics] val EpochMask = (1L << (64 - CountBits)) - 1

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
