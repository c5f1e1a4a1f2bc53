package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-idiomatic replacement for the reference's fjall LSM
  * position-keyed variant cache (SURVEY.md §2 S4,
  * kv_cache/key_encoding.rs: key = [chrom u16][start u64] BE): a
  * chrom-PARTITIONED, start-SORTED parquet layout.
  *
  *  - the [chrom] key prefix becomes directory partition pruning
  *    (only chrom=<c> directories are listed for a point lookup);
  *  - the [start] suffix becomes parquet row-group min/max skipping
  *    (rows sorted by start within each file make the statistics
  *    tight), pushed down as `PushedFilters: [EqualTo(start,..)]`;
  *  - batched lookups are a broadcast semi/inner join against the
  *    key set — the relational analogue of the reference's
  *    exact-hit KV fast path (add-fjall-variation-lookup proposal's
  *    95–98% hit-rate assumption holds the same way here).
  */
object PositionCache {

  /** Write `cache` in point-lookup layout. Sorting within each chrom
    * partition keeps row-group stats tight at any scale. */
  def write(cache: DataFrame, path: String): Unit =
    cache.repartition(col("chrom"))
      .sortWithinPartitions(col("start"))
      .write.mode("overwrite").partitionBy("chrom").parquet(path)

  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Single-position point lookup: both predicates reach the scan
    * (partition filter + pushed row-group filter). */
  def lookup(stored: DataFrame, chrom: String, start: Long): DataFrame =
    stored.where(col("chrom") === chrom && col("start") === start)

  /** Batched lookup: inner join against a (chrom, start) key set —
    * broadcast when small, shuffled hash join at scale. */
  def lookupBatch(stored: DataFrame, keys: DataFrame): DataFrame =
    stored.join(broadcast(keys.select(
        col("chrom").as("_k_chrom"), col("start").cast("long").as("_k_start")).distinct()),
      stored("chrom") === col("_k_chrom") && stored("start") === col("_k_start"))
      .drop("_k_chrom", "_k_start")
}
