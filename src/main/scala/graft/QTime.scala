package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-query timing runner (not part of the library surface):
  * runs named [[SparkEntry.queries]] entries with repetition under the
  * Bench session config, printing per-pass wall times — for quick
  * A/B of a single operator family without the full Bench instrument
  * stack. Usage: graft.QTime <sfDir> <passes> <query...> */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args(1).toInt
    val qs = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lock = new Object
    var stages = 0; var tasks = 0L; var taskMs = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        lock.synchronized {
          stages += 1
          tasks += e.stageInfo.numTasks
          taskMs += e.stageInfo.taskMetrics.executorRunTime
          if (sys.env.contains("QTIME_STAGES")) {
            val rdds =
              if (sys.env.contains("QTIME_RDDS"))
                " rdds=" + e.stageInfo.rddInfos.map(_.name).mkString("|").take(120)
              else ""
            println(f"    stage ${e.stageInfo.stageId} tasks=${e.stageInfo.numTasks} runMs=${e.stageInfo.taskMetrics.executorRunTime} rows=${e.stageInfo.taskMetrics.shuffleReadMetrics.recordsRead} ${e.stageInfo.name.take(80)}$rdds")
          }
        }
    })
    if (sys.env.contains("QTIME_EXPLAIN"))
      for (q <- qs) {
        println(s"===== $q =====")
        SparkEntry.queries(q)(spark, dir).explain("formatted")
      }
    for (pass <- 1 to passes; q <- qs) {
      lock.synchronized { stages = 0; tasks = 0; taskMs = 0 }
      val t0 = System.nanoTime()
      if (sys.env.contains("QTIME_PLAN")) {
        // driver-phase split: frame construction (library code +
        // analysis) / physical planning / execution
        val df = SparkEntry.queries(q)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"$q pass$pass build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
      } else {
        SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      }
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(80) // let stage-completed events drain
      val (st, tk, tm) = lock.synchronized((stages, tasks, taskMs))
      println(f"$q pass$pass $s%.3f stages=$st tasks=$tk taskSec=${tm / 1e3}%.2f")
    }
    spark.stop()
  }
}
