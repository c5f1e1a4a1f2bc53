package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Scale probe for the composed near-duplicate REMOVAL pipeline
  * (VERDICT r17 #7): `Dedup.removeNearDuplicates` is the heaviest
  * pipeline gate (LSH banding → Jaccard verify → connected components
  * → anti join) and its round-17 single-scan claim — the hashed
  * shingle frame is RDD-materialized ONCE and every downstream
  * consumer reads cached partitions — shipped with gate-scale
  * evidence only.
  *
  * The scaled corpus keeps near-duplicate DENSITY constant: each copy
  * suffixes every word with its copy index, so copies share no
  * shingles (verbatim id-shifted copies — TextProbe's recipe — would
  * make all k copies of a doc mutual near-dups and grow the pair set
  * ~k² — a dedup-degenerate corpus, not a scale probe).
  *
  * Two properties, measured at 1x and `factor`x:
  *  - SINGLE SCAN: stages whose input-record count equals the CORPUS
  *    row count are the parquet reads (the shingle feed + the final
  *    anti join re-reading original rows for output — exactly 2 per
  *    run); every other input-bearing stage reads the ~50x-larger
  *    hashed-shingle CACHE partitions (cheap memory hits, the
  *    materialization working). A lost materialization replays the
  *    normalize+shingle+md5 scan per consumer — corpus-sized input
  *    stages jump well past 2 and task time balloons (the round-17
  *    SharedExchange regression shape).
  *  - NEAR-LINEAR WALL: with constant dup density the pipeline is
  *    shuffle-bound on fixed-width keys; wall at `factor`x should
  *    grow ~linearly, not with the pair blowup.
  *
  * Usage: graft.DedupProbe [factor=10] [passes=2]
  * Output: one JSON line per (scale, pass) + a summary line. */
object DedupProbe {
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
    var taskMs = 0L
    var stages = 0
    val stageInput = collection.mutable.ArrayBuffer[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = lock.synchronized {
        val m = e.taskMetrics
        if (m != null) { tasks += 1; taskMs += m.executorRunTime }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          stages += 1
          val in = e.stageInfo.taskMetrics.inputMetrics.recordsRead
          if (in > 0) stageInput += in
        }
    })

    val base = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    def scaled(k: Int): org.apache.spark.sql.DataFrame = {
      val df = (0 until k).map { i =>
        // disjoint per-copy vocabulary: suffix every word (HOF rule:
        // the split binds to its own projection)
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
            split(col("text"), " ").as("_w"))
          .select(col("doc_id"),
            array_join(transform(col("_w"), w => concat(w, lit(s"x$i"))), " ")
              .as("text"))
      }.reduce(_ unionByName _)
      val p = s"/tmp/graft_dedup_probe_${k}x"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val corpora = Seq(1 -> scaled(1), factor -> scaled(factor))
    val counts = corpora.map { case (k, df) => k -> df.count() }.toMap

    val walls = collection.mutable.Map[Int, Double]()
    for (p <- 1 to passes; (k, df) <- corpora) {
      lock.synchronized { tasks = 0; taskMs = 0; stages = 0; stageInput.clear() }
      val t0 = System.nanoTime()
      graft.dedup.Dedup.removeNearDuplicates(df, "text", "doc_id", threshold = 0.5)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120)
      val n = counts(k)
      val (t, tm, st, inputs) =
        lock.synchronized((tasks, taskMs, stages, stageInput.toVector))
      // corpus-sized input stages = parquet scans of the documents
      // table (the cached shingle frame is ~50x bigger per read)
      val corpusScans = inputs.count(r => r >= n * 9 / 10 && r <= n * 11 / 10)
      val cachedReads = inputs.count(_ > n * 11 / 10)
      walls(k) = math.min(walls.getOrElse(k, Double.MaxValue), wall)
      println(f"""{"probe":"dedup","op":"removeNearDuplicates","scale":$k,"pass":$p,"wallSec":$wall%.2f,"stages":$st,"tasks":$t,"taskSec":${tm / 1e3}%.2f,"corpusRows":$n,"corpusScanStages":$corpusScans,"cacheReadStages":$cachedReads,"stageInputRows":${inputs.sorted.reverse.take(12).mkString("[", ",", "]")}}""")
    }
    val sub = walls(factor) / (walls(1) * factor)
    println(f"""{"probe":"dedup","summary":true,"factor":$factor,"wall1x":${walls(1)}%.2f,"wallNx":${walls(factor)}%.2f,"wallVsLinear":$sub%.2f,"note":"corpusScanStages ~2 per run (shingle feed + anti-join output re-read) = single materialized scan; wallVsLinear <= ~1 = near-linear"}""")
    spark.stop()
  }
}
