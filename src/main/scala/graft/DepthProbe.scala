package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Depth window-stage parallelism probe (round-14 verdict #2's done
  * criteria): shows that the prefix-sum window runs MORE concurrent
  * tasks than the input has contigs once the position-bucket width
  * slices chromosomes — the property a per-chrom window can never have
  * (its parallelism ceiling is the contig count, ~25 on a human
  * genome, regardless of cluster size).
  *
  * Method: scale the f9 reads table k× by unioning position-shifted
  * copies (span grows k×, like reading a deeper+wider genome),
  * materialize to parquet ONCE and read back (a k-branch union scan
  * re-pays the task binary per mini-scan), then run `Pileup.depth`
  * twice per mode — `single` (width 2^62: one bucket per chrom, the
  * pre-round-15 per-chrom window) and `bucketed` (width sized to
  * ~16 buckets per chrom) — recording per-stage task counts and how
  * many tasks actually RECEIVED shuffle rows. The window stage under
  * `single` can feed at most #contigs tasks; under `bucketed` it feeds
  * up to #non-empty (chrom, bucket) groups.
  *
  * Usage: graft.DepthProbe [factor=10] [passes=2]
  * Output: one JSON line per (mode, pass) with per-stage stats +
  * a summary line.
  */
object DepthProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 10
    val passes = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-stage accounting: tasks launched, tasks that read >0 shuffle
    // rows (the "fed a partition" signal), total shuffle rows
    val lock = new Object
    val stageTasks = collection.mutable.LinkedHashMap[Int, (Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = lock.synchronized {
        val m = e.taskMetrics
        if (m != null) {
          val rows = m.shuffleReadMetrics.recordsRead
          val (t, ne, r) = stageTasks.getOrElse(e.stageId, (0L, 0L, 0L))
          stageTasks(e.stageId) = (t + 1, ne + (if (rows > 0) 1 else 0), r + rows)
        }
      }
    })

    // k× reads: shift each copy's positions by the base span so the
    // genome SPAN scales with volume (the bucketing lever is span ×
    // coverage, not just row count)
    val base = Tables.reads(spark, sfDir)
    val span = 500000L // Tables.reads position modulus
    val scaled = (0 until factor).map { i =>
      base.withColumn("start", col("start") + lit(i * span).cast("int"))
    }.reduce(_ unionByName _)
    val scaledPath = s"/tmp/graft_depth_probe_${factor}x"
    scaled.write.mode("overwrite").parquet(scaledPath)
    val reads = spark.read.parquet(scaledPath)
    val contigs = reads.select("chrom").distinct().count()
    val totalSpan = factor * span

    // widths: `single` reproduces the per-chrom window (one bucket
    // holds the whole genome); `bucketed` slices each chrom ~16 ways
    val modes = Seq(
      "single" -> (1L << 62),
      "bucketed" -> math.max(totalSpan / 16L, 1L))

    def runOnce(mode: String, width: Long, pass: Int): Unit = {
      lock.synchronized(stageTasks.clear())
      spark.conf.set("spark.bio.depth.posBucketWidth", width.toString)
      val t0 = System.nanoTime()
      try graft.pileup.Pileup.depth(reads)
        .write.format("noop").mode("overwrite").save()
      finally spark.conf.unset("spark.bio.depth.posBucketWidth")
      val wall = (System.nanoTime() - t0) / 1e9
      val stages = lock.synchronized(stageTasks.toSeq)
      // the window stage is the shuffle-fed stage with the most rows
      // whose non-empty task count the bucketing changes; report every
      // shuffle-fed stage so the record carries the raw evidence
      val fed = stages.filter(_._2._3 > 0).sortBy(-_._2._3)
      val stagesJson = fed.map { case (id, (t, ne, r)) =>
        s"""{"stage":$id,"tasks":$t,"nonEmpty":$ne,"rows":$r}"""
      }.mkString("[", ",", "]")
      val maxNonEmpty = if (fed.isEmpty) 0L else fed.map(_._2._2).max
      println(f"""{"probe":"depth","mode":"$mode","pass":$pass,"factor":$factor,"width":$width,"contigs":$contigs,"wallSec":$wall%.2f,"maxNonEmptyTasks":$maxNonEmpty,"stages":$stagesJson}""")
    }

    for ((mode, width) <- modes; p <- 1 to passes) runOnce(mode, width, p)

    // summary: the bucketed window must feed more tasks than contigs
    println(s"""{"probe":"depth","summary":true,"factor":$factor,"contigs":$contigs,"note":"single-mode shuffle stages cap non-empty tasks at contigs; bucketed mode must exceed it"}""")
    spark.stop()
  }
}
