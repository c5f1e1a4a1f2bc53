package graft.core

/** In-band host-contention canary: one daemon thread runs a fixed
  * 2M-iteration LCG burst every `periodMs` for the lifetime of a timed
  * region and reports per-burst times. Off-the-clock calibration
  * AROUND a region cannot attribute contention that starts and ends
  * INSIDE it (round-14: a 2.9x-taskSec probe pass and several 2-5x
  * bench samples with flat surrounding calibration, near-zero GC and
  * steal). The canary's burst times stretch exactly when the host
  * degrades mid-region.
  *
  * Interpretation contract: the canary competes with the workload's
  * own threads, so its ABSOLUTE burst time is scheduling-inflated even
  * on a quiet host — compare p50s across regions with the same
  * workload (passes of one probe scale, samples of one bench query),
  * never against an off-clock baseline. Cost: ~2 ms per period (~4-8%
  * of one core). */
final class Canary(periodMs: Long = 50) {
  private val bursts = collection.mutable.ArrayBuffer[Double]()
  @volatile private var stopped = false
  private var sink = 987654321L
  private val t = new Thread(() => {
    while (!stopped) {
      val b0 = System.nanoTime()
      var x = sink; var n = 0
      while (n < 2000000) { x = x * 6364136223846793005L + 1442695040888963407L; n += 1 }
      sink = x
      bursts.synchronized { bursts += (System.nanoTime() - b0) / 1e9 }
      try Thread.sleep(periodMs) catch { case _: InterruptedException => stopped = true }
    }
  })
  t.setDaemon(true)

  def start(): Canary = { t.start(); this }

  /** (p50, p90, max) over bursts, first two dropped (instance
    * settle; run [[Canary.warm]] once per JVM so the burst loop is
    * JIT-compiled before any judged region); (-1,-1,-1) when fewer
    * than three remaining bursts landed (region too short to judge). */
  def finish(): (Double, Double, Double) = {
    stopped = true; t.interrupt(); t.join(1000)
    val xs = bursts.synchronized(bursts.toVector).drop(2).sorted
    if (xs.size < 3) (-1.0, -1.0, -1.0)
    else (xs(xs.size / 2), xs(math.min((xs.size * 9) / 10, xs.size - 1)), xs.last)
  }
}

object Canary {
  /** JIT-compile the burst loop before the first judged region. */
  def warm(): Unit = {
    val c = new Canary(1).start()
    Thread.sleep(300)
    c.finish()
  }
}
