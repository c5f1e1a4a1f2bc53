package graft.core

import org.apache.spark.sql.DataFrame

/** Adaptive input re-parallelization: small parquet inputs read as a
  * single partition under the default 128 MB maxPartitionBytes, which
  * serializes any expensive narrow pipeline (md5 shingling, probe
  * explodes) until the first shuffle. Round-robin repartition up to
  * the session's default parallelism when the scan under-parallelizes;
  * a no-op at scale where inputs already carry enough partitions —
  * never a second shuffle. (The reference repartitions its streamed
  * side the same way: count_overlaps.rs:143-154 RoundRobinBatch.) */
object Parallelism {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
