package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Scratch job/stage profiler for one gate query (not library surface).
  * Prints a per-job timeline (start offset, duration, gap since the
  * previous job's end, first stage name) so schedule-latency work
  * targets the actual serial chain. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "f11_annotate_e2e"
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.optimizer.excludedRules",
        sys.env.getOrElse("SPARK_GRAFT_EXCLUDE", ""))
      .config("spark.sql.constraintPropagation.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CONSTRAINTS", "true"))
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_MINPART", "1"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_WSCG", "true"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS", "200"))
      .config("spark.sql.exchange.reuse",
        sys.env.getOrElse("SPARK_GRAFT_REUSE", "true"))
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .config("spark.sql.execution.reuseSubquery",
        sys.env.getOrElse("SPARK_GRAFT_REUSE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    @volatile var jobs = 0; @volatile var stages = 0; @volatile var taskMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val events = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Long, Long, String)]()) // (jobId, t0, t1, desc)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        val desc = Option(j.properties.getProperty("spark.job.description"))
          .orElse(j.stageInfos.lastOption.map(_.name)).getOrElse("?")
        starts.put(j.jobId, (j.time, desc.take(90)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.get(e.jobId)
        if (s != null) events.add((e.jobId, s._1, e.time, s._2))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskMs += s.stageInfo.taskMetrics.executorRunTime
        if (sys.env.contains("SPARK_GRAFT_STAGES")) {
          val si = s.stageInfo
          val dur = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
          println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"dur=${dur / 1e3}%6.2fs taskSec=${si.taskMetrics.executorRunTime / 1e3}%7.1f " +
            si.name.take(100))
        }
      }
    })
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    for (i <- 0 until passes) {
      jobs = 0; stages = 0; taskMs = 0L; events.clear()
      if (i == 1 && sys.env.contains("SPARK_GRAFT_RULES"))
        org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      val sampler =
        if (i == 1 && sys.env.contains("SPARK_GRAFT_SAMPLE")) {
          val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
          val t = new Thread(() => {
            try while (true) {
              Thread.getAllStackTraces.forEach { (th, st) =>
                val isExec = th.getName.contains("Executor task")
                val mainOnly = sys.env.contains("SPARK_GRAFT_SAMPLE_MAIN")
                if (if (sys.env.contains("SPARK_GRAFT_SAMPLE_EXEC")) isExec
                    else if (mainOnly) th.getName == "main"
                    else !th.getName.contains("dispatcher") && !isExec) {
                  val depth = if (mainOnly) 8 else 3
                  val top =
                    if (mainOnly) st.take(depth)
                    else st.filter(f => f.getClassName.startsWith("org.apache.spark") ||
                      f.getClassName.startsWith("org.codehaus") || f.getClassName.startsWith("java.security") ||
                      f.getClassName.startsWith("graft")).take(depth)
                  if (top.nonEmpty)
                    counts.merge(top.map(f => f.getClassName.split("\\.").takeRight(2)
                      .mkString(".") + "." + f.getMethodName).mkString(" <- "), 1, _ + _)
                }
              }
              Thread.sleep(20)
            } catch { case _: InterruptedException => }
          })
          t.setDaemon(true); t.start()
          Some((t, counts))
        } else None
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, d)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val qe = df.queryExecution
      qe.assertAnalyzed()
      val tAna = (System.nanoTime() - t0) / 1e9
      if (i == 1 && sys.env.contains("SPARK_GRAFT_RULES")) {
        def exprCount(p: org.apache.spark.sql.catalyst.plans.QueryPlan[_]): Int =
          p.expressions.map(e => e.collect { case x => x }.size).sum
        val nodes = qe.analyzed.collect { case n => n }
        println(s"[plan] analyzed nodes=${nodes.size} exprs=${nodes.map(exprCount).sum}")
        val onodes = qe.optimizedPlan.collect { case n => n }
        println(s"[plan] optimized nodes=${onodes.size} exprs=${onodes.map(exprCount).sum}")
        onodes.map(n => (exprCount(n), n.nodeName, n.output.take(6).map(_.name).mkString(",")))
          .sortBy(-_._1).take(12).foreach { case (c, nm, o) =>
            println(s"[plan] exprs=$c $nm [$o]") }
      }
      qe.optimizedPlan
      val tOpt = (System.nanoTime() - t0) / 1e9
      qe.executedPlan
      val tPhys = (System.nanoTime() - t0) / 1e9
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $q pass$i wall=$wall%.2f build=$tBuild%.2f analyzed=$tAna%.2f optimized=$tOpt%.2f physical=$tPhys%.2f jobs=$jobs stages=$stages execTaskSec=${taskMs / 1e3}%.1f")
      sampler.foreach { case (t, counts) =>
        t.interrupt()
        import scala.jdk.CollectionConverters._
        counts.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (k, v) =>
          println(f"[sample] $v%4d  $k")
        }
      }
      if (i == 1 && sys.env.contains("SPARK_GRAFT_RULES")) {
        println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
      }
      if (i == 1 && sys.env.contains("SPARK_GRAFT_PLAN")) {
        val s = qe.executedPlan.toString
        s.split("\n").filter(l => l.contains("Exchange") || l.contains("Aggregate") ||
          l.contains("Join") || l.contains("Window") || l.contains("Sort") ||
          l.contains("Scan") || l.contains("Interval"))
          .foreach(l => println("[plan] " + l.take(160)))
      }
      if (i == passes - 1) {
        import scala.jdk.CollectionConverters._
        val evs = events.asScala.toSeq.sortBy(_._2)
        val base = evs.headOption.map(_._2).getOrElse(0L)
        var prevEnd = base
        for ((id, s, e, desc) <- evs) {
          val gap = s - prevEnd
          println(f"[job] $id%3d +${(s - base) / 1e3}%6.2fs dur=${(e - s) / 1e3}%6.2fs gap=${gap / 1e3}%6.2fs  $desc")
          prevEnd = math.max(prevEnd, e)
        }
      }
    }
    spark.stop()
  }
}
