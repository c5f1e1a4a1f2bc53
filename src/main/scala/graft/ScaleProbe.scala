package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch scale-amortization probe (round-10 verdict task 7): the
  * annotate family's `weak` rests on the claim that the serial
  * planning/scheduling residue is CONSTANT in data volume. Prove it
  * in-band: synthesize a k× variant table (union of id/position-
  * jittered copies of the sf0.1 vcf — same genomic window, so join
  * selectivity per variant stays comparable), run the e2e annotate at
  * 1× and k×, and record wall + executor-task-seconds at both scales.
  * Expected if the claim holds: task-seconds grow ~k×, wall grows
  * far less (residue amortizes).
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
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        taskMs += s.stageInfo.taskMetrics.executorRunTime
    })
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
    def run(label: String, k: Int): Unit = {
      for (p <- 0 until passes) {
        taskMs = 0L
        val t0 = System.nanoTime()
        graft.vep.Annotate.annotate(vcfAt(k), Tables.vepCache(spark, d),
          Tables.transcripts(spark, d), Tables.exons(spark, d),
          Tables.siftContext(spark, d), Tables.polyphenContext(spark, d),
          Tables.regulatory(spark, d), Tables.motifs(spark, d))
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"$label","factor":$k,"pass":$p,"wall":$wall%.2f,"taskSec":${taskMs / 1e3}%.1f}""")
      }
    }
    run("e2e_1x", 1)
    run(s"e2e_${factor}x", factor)
    spark.stop()
  }
}
