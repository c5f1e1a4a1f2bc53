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
    * partition keeps row-group stats tight at any scale.
    *
    * Chrom keys are normalized to bare names at WRITE time, mirroring
    * the reference's key encoding which strips at both build and probe
    * (kv_cache/key_encoding.rs:61 chrom_to_code): a chr-prefixed input
    * frame written here must still be hit by the bare-probing
    * lookup/lookupBatch below. */
  def write(cache: DataFrame, path: String): Unit =
    cache.withColumn("chrom", bareChrom(col("chrom")))
      .repartition(col("chrom"))
      .sortWithinPartitions(col("start"))
      .write.mode("overwrite").partitionBy("chrom").parquet(path)

  /** Partition-column type inference would turn all-numeric contig
    * directory names (Ensembl bare "0"/"1"/…) into ints — pin chrom
    * back to the stored string type. */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).withColumn("chrom", col("chrom").cast("string"))

  /** Probe-side contig normalization — the reference's KV cache exec
    * strips the VCF side's `chr` prefix before key encoding
    * (kv_cache/cache_exec.rs:565-569); the stored cache keys are
    * always Ensembl bare names and are probed raw. */
  private def bareChrom(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.startsWith("chr"), c.substr(lit(4), lit(Integer.MAX_VALUE))).otherwise(c)

  /** Single-position point lookup: both predicates reach the scan
    * (partition filter + pushed row-group filter). */
  def lookup(stored: DataFrame, chrom: String, start: Long): DataFrame =
    stored.where(col("chrom") === chrom.stripPrefix("chr") && col("start") === start)

  /** Batched lookup: inner join against a (chrom, start) key set —
    * broadcast when small, shuffled hash join at scale. Probe chroms
    * normalize to bare names; stored chroms are used raw. */
  def lookupBatch(stored: DataFrame, keys: DataFrame): DataFrame =
    stored.join(broadcast(keys.select(
        bareChrom(col("chrom")).as("_k_chrom"),
        col("start").cast("long").as("_k_start")).distinct()),
      stored("chrom") === col("_k_chrom") && stored("start") === col("_k_start"))
      .drop("_k_chrom", "_k_start")
}
