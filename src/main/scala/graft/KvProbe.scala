package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** S4 exact-hit fast-path probe (round-11 verdict #6): the reference
  * grew an embedded-KV (`fjall`) cache backend because 95–98% of
  * variants are exact cache hits (add-fjall-variation-lookup
  * proposal). This library's answer is [[graft.sources.PositionCache]]
  * — chrom-partitioned, start-sorted parquet — and this main measures
  * whether that layout actually delivers the point-lookup story:
  *
  *   - single-key lookups (median/p95 over N keys, warm session):
  *     partition prune (only the key's chrom directory listed) +
  *     pushed start equality (row-group min/max skip on the sorted
  *     column) visible in the executed plan;
  *   - a 2,000-key batched probe (the shape annotate actually runs —
  *     the reference amortizes its KV hits the same way);
  *
  * Prints one JSON line; plan evidence lines print before it.
  * PERF.md records the numbers. */
object KvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.PositionCache

    // optional cache-scale factor (round-12 verdict #7: carry the S4
    // claim to scale): k jittered copies of the cache, distinct keys
    val factor = if (args.nonEmpty) args(0).toInt else 1
    val cache0 = Tables.vepCache(spark, sfDir)
    val cache =
      if (factor <= 1) cache0
      else (0 until factor).map { i =>
        cache0.withColumn("start", col("start") + lit(i.toLong * 1000000000L))
          .withColumn("end", col("end") + lit(i.toLong * 1000000000L))
      }.reduce(_ unionByName _)
    val path = s"/tmp/graft_kvprobe_cache_${factor}x"
    val t0 = System.nanoTime()
    PositionCache.write(cache, path)
    val writeSec = (System.nanoTime() - t0) / 1e9
    val stored = PositionCache.open(spark, path)
    val total = stored.count()

    // exact-hit keys drawn from the cache itself (the 95–98% case)
    val keys = stored.select(col("chrom"), col("start"))
      .orderBy(hash(col("start"))).limit(2000).collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // plan evidence from one representative point lookup
    val probe = PositionCache.lookup(stored, keys.head._1, keys.head._2)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    for (m <- "(PartitionFilters|PushedFilters): \\[[^\\]]*\\]".r.findAllIn(plan))
      println("[plan] " + m)

    def timed(f: => Unit): Double = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
    }
    // warm-up, then N single-key lookups
    (1 to 3).foreach(_ => PositionCache.lookup(stored, keys.head._1, keys.head._2).collect())
    val n = 50
    val singles = keys.take(n).map { case (c, s) =>
      timed(PositionCache.lookup(stored, c, s).collect())
    }.sorted
    val med = singles(n / 2)
    val p95 = singles((n * 95) / 100)

    // the batched shape: 2,000 exact keys through one broadcast join
    import spark.implicits._
    val keyDf = keys.toSeq.toDF("chrom", "start")
    val batchWarm = timed(PositionCache.lookupBatch(stored, keyDf).write
      .format("noop").mode("overwrite").save())
    val batch2 = timed(PositionCache.lookupBatch(stored, keyDf).write
      .format("noop").mode("overwrite").save())
    val hits = PositionCache.lookupBatch(stored, keyDf).count()

    println(f"""{"metric":"kv_probe","factor":$factor,"rows":$total,"write_sec":$writeSec%.2f,"point_median_sec":$med%.4f,"point_p95_sec":$p95%.4f,"batch2000_sec":${math.min(batchWarm, batch2)}%.3f,"batch_hits":$hits,"sf":"$sfDir"}""")
    spark.stop()
  }
}
