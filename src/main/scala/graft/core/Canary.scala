package graft.core

/** In-band host-contention canary: one daemon thread alternates two
  * fixed-work bursts every `periodMs` for the lifetime of a timed
  * region — a register-only ALU burst (2M LCG iterations: stretched by
  * cpu-quota throttling and scheduling starvation) and a strided walk
  * over a shared 64 MB array (one touch per cache line: larger than
  * L3, so the walk is DRAM-bound and stretched by MEMORY-BANDWIDTH
  * contention, which leaves the cache-resident ALU burst flat — a
  * 4 MB walk fits in cache and measures nothing, PERF.md round 14). Off-the-clock calibration AROUND a region cannot
  * attribute contention that starts and ends INSIDE it, and round-14
  * measurements showed exactly that gap twice: first 2-5x wall samples
  * invisible to surrounding calibration, then 7-10x cpuSec samples
  * (identical task/job/row counts) invisible to an ALU-only canary —
  * the memory phase is the instrument for the second kind.
  *
  * Interpretation contract: the canary competes with the workload's
  * own threads, so its ABSOLUTE burst time is scheduling-inflated even
  * on a quiet host — compare p50s across regions with the same
  * workload (passes of one probe scale, samples of one bench query),
  * never against an off-clock baseline. Cost: ~3-4 ms per period. */
final class Canary(periodMs: Long = 50) {
  private val alu = collection.mutable.ArrayBuffer[Double]()
  private val mem = collection.mutable.ArrayBuffer[Double]()
  @volatile private var stopped = false
  private var sink = 987654321L
  private val t = new Thread(() => {
    val a = Canary.walkArray
    while (!stopped) {
      val a0 = System.nanoTime()
      var x = sink; var n = 0
      while (n < 2000000) { x = x * 6364136223846793005L + 1442695040888963407L; n += 1 }
      sink = x
      val a1 = System.nanoTime()
      var j = 0; var acc = 0L
      while (j < a.length) { acc += a(j); a(j) = acc + j; j += 8 } // one touch per line
      val a2 = System.nanoTime()
      sink += acc
      alu.synchronized { alu += (a1 - a0) / 1e9; mem += (a2 - a1) / 1e9 }
      try Thread.sleep(periodMs) catch { case _: InterruptedException => stopped = true }
    }
  })
  t.setDaemon(true)

  def start(): Canary = { t.start(); this }

  /** ((aluP50, aluP90, aluMax), (memP50, memP90, memMax)) over bursts,
    * first two dropped (instance settle; run [[Canary.warm]] once per
    * JVM so both burst loops are JIT-compiled before any judged
    * region); all -1 when fewer than three remaining bursts landed. */
  def finish(): ((Double, Double, Double), (Double, Double, Double)) = {
    stopped = true; t.interrupt(); t.join(1000)
    def stats(buf: collection.mutable.ArrayBuffer[Double]) = {
      val xs = alu.synchronized(buf.toVector).drop(2).sorted
      if (xs.size < 3) (-1.0, -1.0, -1.0)
      else (xs(xs.size / 2), xs(math.min((xs.size * 9) / 10, xs.size - 1)), xs.last)
    }
    (stats(alu), stats(mem))
  }
}

object Canary {
  /** Shared 64 MB walk target (Canary lifetimes never overlap within
    * one driver; sharing avoids 64 MB of churn per sample). */
  private[core] val walkArray = new Array[Long](8388608)

  /** JIT-compile both burst loops before the first judged region. */
  def warm(): Unit = {
    val c = new Canary(1).start()
    Thread.sleep(400)
    c.finish()
  }
}
