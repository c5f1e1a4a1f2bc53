package graft

import org.apache.spark.sql.SparkSession

/** Scratch streaming-overhead probe (not part of the library
  * surface): phase-splits one stateless streaming gate shape (the
  * s8 probe stream) to attribute its wall — static-index collect,
  * `start()` latency, micro-batch run, sink read — and prints the
  * engine's own per-batch `durationMs` attribution
  * (triggerExecution / queryPlanning / walCommit / addBatch ...).
  * Usage: graft.StreamProbe <sfDir> <passes> */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.streaming.Trigger
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      val schema = Tables.load(spark, dir, "orders").schema
      val t1 = System.nanoTime()
      val bStream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "orders.parquet").parquet(dir)
        .selectExpr(
          "concat('c', CAST(o_orderkey % 4 AS STRING)) AS contig",
          "CAST((o_custkey * 48271) % 1000000 AS BIGINT) AS pos_start",
          "CAST((o_custkey * 48271) % 1000000 + (o_orderkey % 500) AS BIGINT) AS pos_end",
          "CAST(o_orderkey AS BIGINT) AS id")
      val out = graft.streaming.IntervalStreams.countOverlaps(
        bStream, Tables.ivA(spark, dir))
      val t2 = System.nanoTime()
      val name = "sp" + p
      val mode = sys.env.getOrElse("STREAMPROBE_SINK", "memory")
      val frames = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.DataFrame]
      val q =
        if (mode == "foreach")
          out.writeStream.foreachBatch {
            (df: org.apache.spark.sql.DataFrame, _: Long) =>
              frames.synchronized { frames += graft.core.Materialize(df) }; ()
          }.outputMode("append").trigger(Trigger.AvailableNow()).start()
        else
          out.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(Trigger.AvailableNow())
            .start()
      val t3 = System.nanoTime()
      q.awaitTermination()
      val t4 = System.nanoTime()
      val result =
        if (mode == "foreach") frames.synchronized {
          frames.reduceOption(_ unionByName _)
            .getOrElse(spark.emptyDataFrame)
        } else spark.table(name)
      result.write.format("noop").mode("overwrite").save()
      val t5 = System.nanoTime()
      // scalastyle:off println
      println(f"pass$p schema=${(t1 - t0) / 1e9}%.3f idx=${(t2 - t1) / 1e9}%.3f " +
        f"start=${(t3 - t2) / 1e9}%.3f run=${(t4 - t3) / 1e9}%.3f read=${(t5 - t4) / 1e9}%.3f")
      q.recentProgress.foreach { pr =>
        println(s"  batch ${pr.batchId} rows=${pr.numInputRows} dur=${pr.durationMs}")
      }
      // scalastyle:on println
    }
    spark.stop()
  }
}
