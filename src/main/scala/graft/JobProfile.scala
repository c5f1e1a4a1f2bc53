package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Scratch job/stage profiler for one gate query (not library surface). */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "f11_annotate_e2e"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    @volatile var jobs = 0; @volatile var stages = 0; @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskMs += s.stageInfo.taskMetrics.executorRunTime
      }
    })
    for (i <- 0 until 2) {
      jobs = 0; stages = 0; taskMs = 0L
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[profile] $q pass$i wall=${(System.nanoTime() - t0) / 1e9}%.2f jobs=$jobs stages=$stages execTaskSec=${taskMs / 1e3}%.1f")
    }
    spark.stop()
  }
}
