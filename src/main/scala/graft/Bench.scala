package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR. Prints TWO JSON lines: first a raw-samples
  * record ({"metric":"samples","samples":{...},"load":[...]}), then —
  * as the FINAL stdout line — the compact medians-only record
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  * The driver captures a fixed-size TAIL of stdout (round-9 verdict:
  * the combined one-line record outgrew the window and the official
  * BENCH_r09 held only 48 of 97 queries), so the complete compact
  * record must be last and self-contained.
  *
  * Each query is forced through the `noop` sink so full column
  * evaluation happens (a count() would let Catalyst prune expensive
  * projections); -1 marks an errored query.
  *
  * Contention robustness (round-8 verdict: the official single-sample
  * record showed 3x phantom regressions that four independent runs
  * refuted): each query runs SPARK_GRAFT_REPEATS times (default 3),
  * INTERLEAVED — the full query list runs as round 1, then round 2,
  * ... — so one host-contention burst cannot poison all samples of
  * any query. The ~10 s annotate-family pipelines dominate dispersion
  * (round-9 verdict: a burst spanned all 3 interleaved samples of the
  * two slowest queries), so they run 5 rounds; "load" records the
  * host 1-min load average at each round start, making contention
  * visible in-band. */
object Bench {
  /** The heavy end-to-end pipelines: extra rounds, since a single
    * contention burst can span three back-to-back ~10 s samples. */
  private val HeavyQueries = Set(
    "f11_annotate_e2e", "f11_annotate_default", "f11_typed_columns",
    "f11_typed_full", "f11_annotate_probes", "f11_annotate_fsintron",
    "f11_annotate_noshift", "f11_motif_rich", "f11_provider_frame")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val heavyRepeats = math.max(repeats,
      sys.env.getOrElse("SPARK_GRAFT_HEAVY_REPEATS", "5").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // large-plan workload tuning: constraint propagation is
      // quadratic in plan width and cost the annotate pipeline ~2 s
      // of driver time per invocation (optimizer + AQE re-planning);
      // every gate query is oracle-verified under this setting
      .config("spark.sql.constraintPropagation.enabled", "false")
      // with 32 reduce partitions the bypass-merge shuffle writer
      // opens one file per (map task x partition) — ~45 executor-
      // seconds of file handling per annotate run at bench scale
      // (stack-sampled: DiskBlockObjectWriter.open + KeyLock
      // contention + NIO concat). Threshold 0 selects the
      // tungsten-sort writer: one spill file per map task
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM + parquet footers once so per-query numbers measure
    // the operators, not first-touch class loading
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // optional subset for local iteration: SPARK_GRAFT_ONLY=q1,q2
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // off-the-clock cleanup between queries: release any blocks the
      // previous query materialized (Materialize RDDs, caches), then
      // GC so the ContextCleaner reaps prior broadcasts — query N
      // must not pay query N-1's heap (round-6 drift: late-running
      // queries 1.4-1.6x slower from accumulated resident blocks)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    }
    def repeatsFor(name: String): Int =
      if (HeavyQueries(name)) heavyRepeats else repeats
    val maxRounds = (selected.map { case (n, _) => repeatsFor(n) } :+ repeats).max
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loads = collection.mutable.ArrayBuffer[Double]()
    val samples: Seq[(String, Seq[Double])] = {
      val acc = collection.mutable.LinkedHashMap[String, Vector[Double]]()
      for (round <- 1 to maxRounds) {
        loads += osBean.getSystemLoadAverage
        for ((name, fn) <- selected if round <= repeatsFor(name))
          acc(name) = acc.getOrElse(name, Vector.empty) :+ runOnce(name, fn)
      }
      acc.toSeq
    }
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      else if (ok.size % 2 == 1) ok(ok.size / 2)
      else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0
    }
    val results = samples.map { case (name, xs) => name -> median(xs) }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val raw = samples.map { case (k, xs) =>
      "\"" + k + "\":[" + xs.map(x => f"$x%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val loadArr = loads.map(x => f"$x%.2f").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // raw samples + per-round host load first; the compact,
    // self-contained medians record is the FINAL line (driver contract)
    println(s"""{"metric":"samples","samples":$raw,"load":$loadArr,"repeats":$repeats,"heavy_repeats":$heavyRepeats}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"repeats":$repeats,"sf":"$sfDir"}""")
    spark.stop()
  }
}
