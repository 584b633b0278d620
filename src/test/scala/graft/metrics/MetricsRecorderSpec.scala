package graft.metrics

import org.scalatest.funsuite.AnyFunSuite

/** The sliding-window rate ring (source/stats.go:36-53 parity) on an
  * injected clock: claim/reset per second, trailing-window math, stale
  * slots reading as zero, and wraparound past the ring length. */
class MetricsRecorderSpec extends AnyFunSuite {

  private def recorderAt(t0: Long): (MetricsRecorder, () => Long, Long => Unit) = {
    var now = t0
    val r = MetricsRecorder.forClock(() => now)
    (r, () => now, sec => now = sec)
  }

  test("windowed rate is amount-in-window over window seconds") {
    val (r, _, setNow) = recorderAt(1000L)
    r.recordWindow(100); setNow(1001L); r.recordWindow(100)
    setNow(1002L); r.recordWindow(100)
    // 300 rows across seconds 1000-1002, read at 1002 over 10 s
    assert(r.readRowsPerSecWindowed(10) == 30.0)
    // a 3-second window sees the same 300 rows at 100/s
    assert(r.readRowsPerSecWindowed(3) == 100.0)
  }

  test("rows outside the trailing window stop counting") {
    val (r, _, setNow) = recorderAt(2000L)
    r.recordWindow(500)
    setNow(2005L)
    assert(r.readRowsPerSecWindowed(10) == 50.0, "still inside the window")
    setNow(2050L)
    assert(r.readRowsPerSecWindowed(10) == 0.0,
      "a stale ring slot must read as zero, not leak an old second's rows")
  }

  test("ring wraparound: a reused slot is re-claimed for the new second") {
    val (r, _, setNow) = recorderAt(3000L)
    r.recordWindow(640)
    // 64 buckets: second 3064 lands on the SAME slot as 3000
    setNow(3064L)
    r.recordWindow(10)
    assert(r.readRowsPerSecWindowed(10) == 1.0,
      "the slot must hold only the new second's 10 rows, not 650")
  }

  test("multiple records within one second accumulate") {
    val (r, _, _) = recorderAt(4000L)
    (1 to 5).foreach(_ => r.recordWindow(20))
    assert(r.readRowsPerSecWindowed(1) == 100.0)
  }
}
