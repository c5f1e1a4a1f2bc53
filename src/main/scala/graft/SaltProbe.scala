package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Contig-skew salting probe for the Partitioned-mode failover joins:
  * shows that `spark.bio.partitioned.saltFactor=auto` narrows the
  * hot-contig task-time spread — the property the manual lever landed
  * for in round 15, now selected from the probe side's observed
  * per-contig counts with no user knob.
  *
  * Method: a skewed fixture (~94% of probe rows on one contig, span
  * scaled by `factor`), `PartitionedJoin.nearestPartitioned` under
  * salt 1 vs auto, recording the co-group stage's task count, max
  * task time and task-time spread (max/mean over non-trivial tasks).
  * Salt 1 pins the hot contig on ONE task (spread ≈ task count);
  * auto must cut maxTask and the spread while returning the same rows.
  *
  * Round 17: the auto trigger is pinned from BOTH sides — besides the
  * hot-contig win it must choose S=1 on the no-skew shapes that
  * regressed in round 16 (VERDICT r16 #1/#7): the f4 shape (small
  * sampled probe against a large build — tier-1 bytes gate, no probe
  * job) and the f8 shape (large even-contig probe whose per-contig
  * share is below the per-salt work floor). Decisions print as
  * `"probe":"salt_decision"` records.
  *
  * Usage: graft.SaltProbe [factor=10] [passes=2] */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 10
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val lock = new Object
    val taskMs = collection.mutable.ArrayBuffer[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = lock.synchronized {
        if (e.taskMetrics != null) taskMs += e.taskMetrics.executorRunTime
      }
    })

    // skewed probe: 15/16 of rows on contig "hot"; modest build side
    val n = 200000 * factor
    val probe = spark.range(n).select(
        when(col("id") % 16 === 0, concat(lit("c"), col("id") % 8))
          .otherwise(lit("hot")).as("contig"),
        (col("id") * 37 % (1000000L * factor)).as("pos_start"),
        (col("id") * 37 % (1000000L * factor) + 150).as("pos_end"),
        col("id"))
      .as[(String, Long, Long, Long)].toDF("contig", "pos_start", "pos_end", "id")
    val build = spark.range(20000).select(
        concat(lit("c"), col("id") % 8).as("contig"),
        (col("id") * 211 % (1000000L * factor)).as("pos_start"),
        (col("id") * 211 % (1000000L * factor) + 400).as("pos_end"),
        col("id"))
      .as[(String, Long, Long, Long)].toDF("contig", "pos_start", "pos_end", "id")
      .unionByName(probe.where("id % 64 = 0")
        .select(lit("hot").as("contig"), col("pos_start"),
          (col("pos_end") + 250).as("pos_end"), col("id")))
    val probeP = "/tmp/graft_salt_probe_p"; val buildP = "/tmp/graft_salt_probe_b"
    probe.write.mode("overwrite").parquet(probeP)
    build.write.mode("overwrite").parquet(buildP)
    val pr = spark.read.parquet(probeP); val bd = spark.read.parquet(buildP)

    val ic = graft.core.IntervalCols.default
    def run(mode: String, pass: Int): Long = {
      if (mode == "auto") spark.conf.unset("spark.bio.partitioned.saltFactor")
      else spark.conf.set("spark.bio.partitioned.saltFactor", mode)
      lock.synchronized(taskMs.clear())
      val t0 = System.nanoTime()
      val out = graft.ranges.PartitionedJoin.nearestPartitioned(
        bd, pr, ic, ic, graft.core.FilterOp.Weak, 1,
        includeOverlaps = true, computeDistance = true, tieBreakCol = "id")
      val cnt = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val ts = lock.synchronized(taskMs.toSeq).filter(_ > 20) // non-trivial tasks
      val maxT = if (ts.isEmpty) 0L else ts.max
      val mean = if (ts.isEmpty) 0.0 else ts.sum.toDouble / ts.size
      val spread = if (mean == 0) 0.0 else maxT / mean
      println(f"""{"probe":"salt","mode":"$mode","pass":$pass,"factor":$factor,"rows":$cnt,"wallSec":$wall%.2f,"nonTrivialTasks":${ts.size},"maxTaskMs":$maxT,"taskSpread":$spread%.2f}""")
      cnt
    }
    var rows = Set.empty[Long]
    for (p <- 1 to passes; mode <- Seq("1", "auto")) rows += run(mode, p)
    spark.conf.unset("spark.bio.partitioned.saltFactor")
    require(rows.size == 1, s"row counts diverged across modes: $rows")

    // --- decision pinning: both extremes (VERDICT r16 #7) ---
    def decided(name: String, build: org.apache.spark.sql.DataFrame,
                p: org.apache.spark.sql.DataFrame, expect: String): Int = {
      val s = graft.ranges.PartitionedJoin.decideSalt(build, p, "contig")
      println(s"""{"probe":"salt_decision","fixture":"$name","S":$s,"expect":"$expect"}""")
      s
    }
    val sHot = decided("hot_contig", bd, pr, "S>1")
    // f4 shape: small sampled probe vs large build — bytes gate, no job
    val f4dir = "/tmp/graft_salt_probe_f4"
    pr.where("id % 512 = 0").write.mode("overwrite").parquet(f4dir)
    val sF4 = decided("noskew_small_probe", pr, spark.read.parquet(f4dir), "S=1")
    // f8 shape: large even-contig probe, per-contig share under the floor
    val f8dir = "/tmp/graft_salt_probe_f8"
    spark.range(600000).select(
        concat(lit("c"), col("id") % 4).as("contig"),
        (col("id") * 37 % 1000000L).as("pos_start"),
        (col("id") * 37 % 1000000L + 150).as("pos_end"), col("id"))
      .write.mode("overwrite").parquet(f8dir)
    val sF8 = decided("noskew_even_4contig", bd, spark.read.parquet(f8dir), "S=1")
    require(sHot > 1 && sF4 == 1 && sF8 == 1,
      s"auto salt decisions off: hot=$sHot f4=$sF4 f8=$sF8")
    println(s"""{"probe":"salt","summary":true,"factor":$factor,"note":"auto must cut maxTaskMs and taskSpread vs salt 1 on the hot-contig fixture; row counts identical"}""")
    spark.stop()
  }
}
