package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}

/** Scale-amortization probe + WALL DECOMPOSITION (round-10 verdict
  * task 7; round-11 verdict #1): the annotate family's `weak` rests on
  * the claim that the serial planning/scheduling residue is constant
  * in data volume — and the round-11 judge could reproduce the
  * task-second linearity but NOT the recorded 10× wall. So the probe
  * now attributes each pass's wall instead of just reporting it:
  *
  *   - `taskSec`    executor run time (the compute claim's basis)
  *   - `cpuSec`     executor CPU time (taskSec minus in-task blocking)
  *   - `gcSec`      task-attributed JVM GC time
  *   - `fetchSec` / `shufWSec`  shuffle read-wait / write time
  *   - `busyWall`   wall covered by >= 1 running task (union of task
  *                  [launch, finish] intervals)
  *   - `idleWall`   wall with ZERO running tasks — driver-only time:
  *                  planning, AQE re-optimization, job scheduling,
  *                  broadcast/index builds
  *   - `conc`       taskSec / busyWall (achieved parallelism)
  *
  * The k× table unions id/position-jittered copies of the sf0.1 vcf —
  * same genomic window, so per-variant join selectivity stays
  * comparable.
  *
  * Usage: graft.ScaleProbe [factor=10] [passes=3] */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 10
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lock = new Object
    var taskMs, cpuNs, gcMs, fetchMs, shufWNs, deserMs, jobs = 0L
    val intervals = collection.mutable.ArrayBuffer[(Long, Long)]()
    val jobSpans = collection.mutable.ArrayBuffer[(Long, Long)]()
    val jobStarts = collection.mutable.HashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = lock.synchronized {
        val m = e.taskMetrics
        if (m != null) {
          taskMs += m.executorRunTime
          cpuNs += m.executorCpuTime
          gcMs += m.jvmGCTime
          fetchMs += m.shuffleReadMetrics.fetchWaitTime
          shufWNs += m.shuffleWriteMetrics.writeTime
          deserMs += m.executorDeserializeTime
        }
        if (e.taskInfo != null)
          intervals += ((e.taskInfo.launchTime, e.taskInfo.finishTime))
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = lock.synchronized {
        jobStarts(e.jobId) = e.time
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = lock.synchronized {
        jobs += 1
        jobStarts.remove(e.jobId).foreach(s => jobSpans += ((s, e.time)))
      }
    })
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def jvmGcMs: Long = {
      var t = 0L
      gcBeans.forEach(b => t += math.max(b.getCollectionTime, 0))
      t
    }
    val d = "/root/testdata/sf0.1"
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    def vcfAt(k: Int) = {
      val base = Tables.vcf(spark, d)
      (0 until k).map { i =>
        base.select(col("chrom"),
          (col("start") + lit(i.toLong * 13 % 97)).as("start"),
          (col("end") + lit(i.toLong * 13 % 97)).as("end"),
          (col("id") + lit(i.toLong * 10000000L)).as("id"),
          col("ref"), col("alt"))
      }.reduce(_ unionByName _)
    }
    def busyWall(iv: Seq[(Long, Long)]): Double = {
      val sorted = iv.sortBy(_._1)
      var total = 0L
      var curS = -1L; var curE = -1L
      for ((s, e) <- sorted) {
        if (s > curE) { if (curE > curS) total += curE - curS; curS = s; curE = e }
        else if (e > curE) curE = e
      }
      if (curE > curS) total += curE - curS
      total / 1e3
    }
    def run(label: String, k: Int): Unit = {
      for (p <- 0 until passes) {
        lock.synchronized {
          taskMs = 0; cpuNs = 0; gcMs = 0; fetchMs = 0; shufWNs = 0; deserMs = 0
          jobs = 0; intervals.clear(); jobSpans.clear(); jobStarts.clear()
        }
        val gc0 = jvmGcMs
        val t0 = System.nanoTime()
        graft.vep.Annotate.annotate(vcfAt(k), Tables.vepCache(spark, d),
          Tables.transcripts(spark, d), Tables.exons(spark, d),
          Tables.siftContext(spark, d), Tables.polyphenContext(spark, d),
          Tables.regulatory(spark, d), Tables.motifs(spark, d))
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // drain the listener bus so the pass's own events are counted
        // (listenerBus is private[spark]; a short settle suffices for
        // the async queue at this event volume)
        Thread.sleep(300)
        val jvmGc = (jvmGcMs - gc0) / 1e3
        val (tSec, cSec, gSec, fSec, wSec, dSec, busy, nJobs, jobWall) =
          lock.synchronized {
            (taskMs / 1e3, cpuNs / 1e9, gcMs / 1e3, fetchMs / 1e3,
              shufWNs / 1e9, deserMs / 1e3, busyWall(intervals.toSeq),
              jobs, busyWall(jobSpans.toSeq))
          }
        println(f"""{"probe":"$label","factor":$k,"pass":$p,"wall":$wall%.2f,"taskSec":$tSec%.1f,"cpuSec":$cSec%.1f,"gcSec":$gSec%.1f,"jvmGcSec":$jvmGc%.1f,"fetchSec":$fSec%.1f,"shufWSec":$wSec%.1f,"deserSec":$dSec%.1f,"busyWall":$busy%.2f,"idleWall":${math.max(wall - busy, 0)}%.2f,"jobs":$nJobs,"jobWall":$jobWall%.2f,"conc":${if (busy > 0) tSec / busy else 0}%.1f}""")
      }
    }
    run("e2e_1x", 1)
    run(s"e2e_${factor}x", factor)
    spark.stop()
  }
}
