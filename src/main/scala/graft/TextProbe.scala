package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Scale probe for the round-15 LLM-pipeline operators that shipped
  * with gate-scale evidence only (VERDICT r15 #6): benchmark
  * decontamination and sequence packing.
  *
  * Decontamination property: with a broadcast-small benchmark side,
  * the corpus side must stream MAP-ONLY out of the scan — the join
  * stage reads the corpus from the scan (not a shuffle), so total
  * shuffle-read rows stay ~bench-side-sized + aggregate partials,
  * NOT corpus-n-gram-sized; task count scales with the corpus.
  *
  * Packing property: doc-stage tasks scale ~linearly with corpus
  * size, and at a forced small bucket width the level-1 carry window
  * runs on MANY tasks (the round-15 single-level carry pushed every
  * bucket row through ONE global-order window task — the two-level
  * carry caps single-task work at idSpan/width² rows).
  *
  * Usage: graft.TextProbe [factor=10] [passes=2]
  * Output: one JSON line per (op, scale, pass) + a summary line. */
object TextProbe {
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
    var tasks = 0L
    var shuffleRows = 0L
    var inputRows = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = lock.synchronized {
        val m = e.taskMetrics
        if (m != null) {
          tasks += 1
          shuffleRows += m.shuffleReadMetrics.recordsRead
          inputRows += m.inputMetrics.recordsRead
        }
      }
    })

    // k-times corpus: id-shifted copies so doc ids stay unique and the
    // id span (packing's bucket domain) scales with volume
    val base = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    def scaled(k: Int): org.apache.spark.sql.DataFrame = {
      val df = (0 until k).map { i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text"))
      }.reduce(_ unionByName _)
      val p = s"/tmp/graft_text_probe_${k}x"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val small = scaled(1)
    val big = scaled(factor)
    val bench = small.where("doc_id % 97 = 0") // fixed tiny eval set

    def run(op: String, scale: Int, pass: Int)(body: () => org.apache.spark.sql.DataFrame): Unit = {
      lock.synchronized { tasks = 0; shuffleRows = 0; inputRows = 0 }
      val t0 = System.nanoTime()
      body().write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val (t, sr, ir) = lock.synchronized((tasks, shuffleRows, inputRows))
      println(f"""{"probe":"text","op":"$op","scale":$scale,"pass":$pass,"wallSec":$wall%.2f,"tasks":$t,"shuffleRows":$sr,"inputRows":$ir}""")
    }

    for (p <- 1 to passes) {
      run("decontaminate", 1, p)(() =>
        graft.text.Decontaminate.contaminationPairs(
          small, bench, "text", "doc_id", "doc_id", n = 5, minShared = 2L))
      run("decontaminate", factor, p)(() =>
        graft.text.Decontaminate.contaminationPairs(
          big, bench, "text", "doc_id", "doc_id", n = 5, minShared = 2L))
      run("pack", 1, p)(() =>
        graft.text.Packing.packSequences(small, "text", "doc_id", 256L))
      run("pack", factor, p)(() =>
        graft.text.Packing.packSequences(big, "text", "doc_id", 256L))
    }
    // forced-small width: the level-1 carry must NOT be a single-task
    // global window (two-level carry; VERDICT r15 #3). Count the tasks
    // of stages that read bucket-cardinality shuffle rows.
    val stageTasks = collection.mutable.LinkedHashMap[Int, (Long, Long)]()
    val l2 = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = lock.synchronized {
        val m = e.taskMetrics
        if (m != null) {
          val (t, r) = stageTasks.getOrElse(e.stageId, (0L, 0L))
          stageTasks(e.stageId) = (t + 1, r + m.shuffleReadMetrics.recordsRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(l2)
    spark.conf.set("spark.bio.pack.idBucketWidth", "64")
    // AQE coalesces the probe's tiny bucket frame to one partition
    // regardless of plan shape; disable coalescing here so the stage's
    // task count reflects the PLAN's parallelism — the round-15
    // single-level carry REQUIRED SinglePartition (a global-order
    // window no size can widen), the two-level carry only CLUSTERS by
    // super-bucket (wide whenever the data is)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      lock.synchronized(stageTasks.clear())
      graft.text.Packing.packSequences(big, "text", "doc_id", 256L)
        .write.format("noop").mode("overwrite").save()
    } finally {
      spark.conf.unset("spark.bio.pack.idBucketWidth")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
    val nDocs = big.count()
    val nBuckets = big.select(expr("doc_id DIV 64")).distinct().count()
    // the carry stages: read >= one row per bucket but far fewer than
    // the corpus; single-level carry would put nBuckets rows on 1 task
    val carryStages = lock.synchronized(stageTasks.toSeq)
      .filter { case (_, (_, r)) => r >= nBuckets / 2 && r < nDocs / 2 }
    val carryJson = carryStages.map { case (id, (t, r)) =>
      s"""{"stage":$id,"tasks":$t,"rows":$r}"""
    }.mkString("[", ",", "]")
    val maxCarryTasks = if (carryStages.isEmpty) 0L else carryStages.map(_._2._1).max
    println(s"""{"probe":"text","op":"pack_small_width","width":64,"docs":$nDocs,"buckets":$nBuckets,"maxCarryStageTasks":$maxCarryTasks,"carryStages":$carryJson}""")
    println(s"""{"probe":"text","summary":true,"factor":$factor,"note":"decontaminate shuffleRows must stay ~flat across scales while tasks grow; pack tasks scale ~linearly; pack carry stage must exceed 1 task at width 64"}""")
    spark.stop()
  }
}
