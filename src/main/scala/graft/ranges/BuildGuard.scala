package graft.ranges

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-side size guard for every CollectLeft-style operator (the
  * broadcast interval joins, the variant-lookup probes, the static
  * side of the streaming interval probes).
  *
  * The CollectLeft contract — identical to Spark's own
  * BroadcastHashJoin and the reference's CollectLeft mode
  * (interval_join.rs:394-413) — collects the FULL build rows to the
  * driver to assemble the broadcast row table, so the build side is
  * bounded by driver heap. The reference's planner picks CollectLeft
  * vs Partitioned itself from plan statistics; this guard does the
  * same choice for the [[Ranges]] API: a build side whose Catalyst
  * size estimate exceeds `spark.graft.broadcast_build_limit` (bytes)
  * silently fails over to the partitioned grid-bucket path
  * ([[Ranges.overlapPartitioned]] family) — same rows, no driver
  * collect, no memory cap. Operators with no partitioned equivalent
  * ([[Ranges.nearest]], [[Ranges.subtract]], the streaming probes)
  * use [[requireFits]] and fail loudly instead of OOMing mid-collect.
  *
  * The estimate is `optimizedPlan.stats.sizeInBytes` — the same
  * statistic Spark's own autoBroadcastJoinThreshold consults; it
  * costs no job. */
object BuildGuard {

  val ConfKey = "spark.graft.broadcast_build_limit"

  /** Default cap: 1 GiB of estimated build bytes (the planner
    * strategy's historical constant). */
  val DefaultBytes: Long = 1L << 30

  def limitBytes(spark: SparkSession): Long =
    spark.conf.getOption(ConfKey).map(_.toLong).getOrElse(DefaultBytes)

  /** Catalyst's size estimate of the optimized plan — no job runs. */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** True when the build side fits the configured broadcast cap. */
  def fits(df: DataFrame): Boolean =
    estimatedBytes(df) <= BigInt(limitBytes(df.sparkSession))

  /** Loud failure for CollectLeft operators with no partitioned
    * escape hatch: an oversized build must not reach `collect()`. */
  def requireFits(df: DataFrame, op: String, hint: String): Unit = {
    val est = estimatedBytes(df)
    val lim = limitBytes(df.sparkSession)
    if (est > BigInt(lim)) throw new IllegalArgumentException(
      s"$op: build side estimated at $est bytes exceeds $ConfKey=$lim. " +
        s"The build side is collected to the driver (CollectLeft contract); $hint")
  }
}
