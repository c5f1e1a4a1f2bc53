package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Island-sweep window-stage parallelism probe — the merge/cluster/
  * complement counterpart of [[DepthProbe]]: shows that the bucketed
  * island sweep (`spark.bio.sweep.posBucketWidth`) feeds MORE
  * concurrent window tasks than the input has contigs, the property a
  * per-contig window can never have (ceiling = contig count, ~25 on a
  * human genome, regardless of cluster size).
  *
  * Method: scale the f5 interval table k× by unioning position-shifted
  * copies (span grows k×), materialize to parquet once, then run
  * `Ranges.merge` + `Ranges.cluster` + `Ranges.complement` per mode —
  * `single` (width 2^62: the pre-round-15 per-contig sweep) and
  * `bucketed` (width sized to ~16 buckets per contig) — recording
  * per-stage task counts and how many tasks actually received shuffle
  * rows.
  *
  * Usage: graft.SweepProbe [factor=10] [passes=2]
  * Output: one JSON line per (op, mode, pass) + a summary line.
  */
object SweepProbe {
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

    // k× intervals: shift each copy by the base span (ivA positions are
    // mod 1e6) so the genome SPAN scales with volume
    val base = Tables.ivA(spark, sfDir)
    val span = 1000000L
    val scaled = (0 until factor).map { i =>
      base.withColumn("pos_start", col("pos_start") + lit(i * span))
        .withColumn("pos_end", col("pos_end") + lit(i * span))
    }.reduce(_ unionByName _)
    val scaledPath = s"/tmp/graft_sweep_probe_${factor}x"
    scaled.write.mode("overwrite").parquet(scaledPath)
    val iv = spark.read.parquet(scaledPath)
    val contigs = iv.select("contig").distinct().count()
    val totalSpan = factor * span

    val modes = Seq(
      "single" -> (1L << 62),
      "bucketed" -> math.max(totalSpan / 16L, 1L))
    val ops = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "merge" -> (() => graft.ranges.Ranges.merge(iv)),
      "cluster" -> (() => graft.ranges.Ranges.cluster(iv)),
      "complement" -> (() => graft.ranges.Ranges.complement(iv)))

    def runOnce(op: String, body: () => org.apache.spark.sql.DataFrame,
        mode: String, width: Long, pass: Int): Unit = {
      lock.synchronized(stageTasks.clear())
      spark.conf.set("spark.bio.sweep.posBucketWidth", width.toString)
      val t0 = System.nanoTime()
      try body().write.format("noop").mode("overwrite").save()
      finally spark.conf.unset("spark.bio.sweep.posBucketWidth")
      val wall = (System.nanoTime() - t0) / 1e9
      val stages = lock.synchronized(stageTasks.toSeq)
      val fed = stages.filter(_._2._3 > 0).sortBy(-_._2._3)
      val stagesJson = fed.map { case (id, (t, ne, r)) =>
        s"""{"stage":$id,"tasks":$t,"nonEmpty":$ne,"rows":$r}"""
      }.mkString("[", ",", "]")
      val maxNonEmpty = if (fed.isEmpty) 0L else fed.map(_._2._2).max
      println(f"""{"probe":"sweep","op":"$op","mode":"$mode","pass":$pass,"factor":$factor,"width":$width,"contigs":$contigs,"wallSec":$wall%.2f,"maxNonEmptyTasks":$maxNonEmpty,"stages":$stagesJson}""")
    }

    for ((op, body) <- ops; (mode, width) <- modes; p <- 1 to passes)
      runOnce(op, body, mode, width, p)

    println(s"""{"probe":"sweep","summary":true,"factor":$factor,"contigs":$contigs,"note":"single-mode sweep stages cap non-empty tasks at contigs; bucketed mode must exceed it"}""")
    spark.stop()
  }
}
