package graft.vep

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The WRITER half of the reference's raw-Ensembl-cache ETL
  * (bio-function-vep/src/cache_builder.rs:1-30): emits the per-entity
  * partitioned parquet layout every lookup/annotate query consumes —
  * main chromosomes in their own partition (`chr1` … `chr22`, `X`, `Y`,
  * `MT` → the reference's `variation/chr{c}.parquet`), every other
  * contig pooled into one `other` partition (`other.parquet`,
  * cache_builder.rs:296-320), rows start-sorted within each file so
  * row-group min/max statistics stay tight, plus the dual KV sink for
  * `variation` ([[graft.sources.PositionCache]] — the fjall analogue,
  * built FROM the written parquet exactly like
  * `build_variation_fjall_from_parquet`). A live rows-written progress
  * callback mirrors the reference's `OnProgress`
  * (cache_builder.rs:43-50), fed from Spark task output metrics.
  *
  * The READER half of the reference ETL — parsing the raw Ensembl
  * cache serialization — lives in an external crate
  * (`datafusion_bio_format_ensembl_cache`) with no fixture in this
  * sandbox; this builder starts from any DataFrame holding the entity
  * rows (schema-contract-checked) and is gated by round-tripping the
  * repo's own cache tables through it.
  */
object CacheBuilder {

  /** Progress callback: (entity, format, cumulative rows written).
    * `format` ∈ "parquet" | "kv" (the reference's "parquet"/"fjall"). */
  type OnProgress = (String, String, Long) => Unit

  /** Main chromosomes that get their own partition
    * (cache_builder.rs:53-57 MAIN_CHROMS). */
  val MainChroms: Seq[String] = (1 to 22).map(_.toString) ++ Seq("X", "Y", "MT")

  /** Deterministic scratch dir for round-trip gates, keyed by the
    * source data dir AND the calling gate (no timestamps — every
    * build overwrites, so a stale artifact can never feed a later
    * run; per-GATE so one gate's rebuild can never replace the part
    * files another gate's already-analyzed plan has pinned — a
    * shared dir made every re-execution of the first gate fail with
    * FILE_NOT_EXIST once the second gate rebuilt it). */
  def roundTripDir(sourceDir: String, gate: String): String =
    "/tmp/graft_built_cache_" +
      java.lang.Integer.toHexString((sourceDir + "#" + gate).hashCode)

  /** Directory-partition key: `chr{c}` for main chromosomes (bare or
    * already chr-prefixed input), `other` for every other contig —
    * chrom names normalize to Ensembl bare form at write, the same
    * two-sided normalization as [[graft.sources.PositionCache.write]]
    * (kv_cache/key_encoding.rs chrom_to_code strips at build AND
    * probe). */
  private def shardCol(chrom: org.apache.spark.sql.Column) = {
    val bare = when(chrom.startsWith("chr"),
      chrom.substr(lit(4), lit(Integer.MAX_VALUE))).otherwise(chrom)
    when(bare.isin(MainChroms: _*), concat(lit("chr"), bare)).otherwise(lit("other"))
  }

  private def bare(chrom: org.apache.spark.sql.Column) =
    when(chrom.startsWith("chr"),
      chrom.substr(lit(4), lit(Integer.MAX_VALUE))).otherwise(chrom)

  /** Per-entity max rows per parquet row group, mirroring the
    * reference's `row_group_size()` (cache_builder.rs:1863-1872;
    * pinned by its `test_row_group_size`). The `translation_sift` /
    * `translation_polyphen` matrix entities inherit the translation
    * size; unknown entities keep the parquet default. */
  private[graft] def rowGroupRows(entity: String): Option[Int] = entity match {
    case "variation" => Some(100000)
    case "transcript" => Some(8000)
    case "exon" => Some(45000)
    case e if e.startsWith("translation") => Some(6000)
    case "regulatory" => Some(9000)
    case "motif" => Some(10000)
    case _ => None
  }

  /** Writer with the reference's physical file parameters
    * (cache_builder.rs:449-451 and 1903-1909): ZSTD compression and
    * the per-entity row-group cap — expressed through parquet-hadoop's
    * exact row-count limit (`parquet.block.row.count.limit`), which
    * Spark forwards to the job Configuration. The one parameter
    * Spark's writer cannot reproduce is the `SortingColumn` footer
    * stamp (cache_builder.rs:1881-1906): the physical order is already
    * sorted identically, so row-group min/max pruning behaves the
    * same; only the footer DECLARATION is absent. */
  private def writerFor(df: DataFrame, entity: String) = {
    val w = df.write.mode("overwrite").option("compression", "zstd")
    rowGroupRows(entity).fold(w)(n =>
      w.option("parquet.block.row.count.limit", n.toString))
  }

  /** True when the directory already holds at least one parquet part
    * (the reference's `dir_has_parquet_files` skip probe,
    * cache_builder.rs:3431-3455 — subdirectories too, for the
    * `_shard=` layout). */
  private[graft] def dirHasParquet(path: String): Boolean = {
    def walk(f: java.io.File): Boolean =
      f.isFile && f.getName.endsWith(".parquet") ||
        (f.isDirectory && Option(f.listFiles()).exists(_.exists(walk)))
    walk(new java.io.File(path))
  }

  /** Write one entity. Positional entities (those with a `chrom`
    * column) shard per main chromosome and sort by `start` within each
    * file; keyed entities (translations: SIFT/PolyPhen matrices) have
    * no position — they cluster and sort by `transcript_id`, the
    * reference's re-sorted second pass (cache_builder.rs:5-6,
    * 1038-1123). Entity dedup follows the reference's export queries
    * (pinned by its tests even though the builder function lives in
    * the external format crate): transcript keeps one row per
    * `stable_id` (cache_builder.rs:2421-2434), exon one per
    * (transcript_id, exon_number) (rs:2470-2477), translation one per
    * transcript_id with the home-region preference (rs:77-88).
    *
    * `overwrite = false` (the reference's default,
    * cache_builder.rs:3460-3464) SKIPS an entity whose directory
    * already holds parquet — resumable builds; returns 0 for a
    * skipped entity. Returns rows written otherwise. */
  def buildEntity(df: DataFrame, outDir: String, entity: String,
      onProgress: OnProgress = null, overwrite: Boolean = false): Long = {
    val path = s"$outDir/$entity"
    if (!overwrite && dirHasParquet(path)) return 0L
    val positional = df.columns.contains("chrom")
    if (positional) {
      require(df.columns.contains("start"),
        s"entity '$entity' has chrom but no start column; cache layout needs both " +
        s"(got: ${df.columns.mkString(", ")})")
    } else {
      require(df.columns.contains("transcript_id"),
        s"entity '$entity' has neither chrom nor transcript_id; no layout key " +
        s"(got: ${df.columns.mkString(", ")})")
    }
    withRowProgress(df.sparkSession, entity, "parquet", onProgress) {
      if (positional) {
        // RANGE-partitioned by (_shard, <sort key>): a hash
        // repartition on _shard alone would put a whole chromosome's
        // rows in ONE partition — a single writer task per chrom,
        // which at 100 TB is the job's wall clock. Range partitioning
        // splits big chroms across many writers AND makes each
        // output file a disjoint, sorted key range (file-level
        // min/max pruning on top of row-group pruning — stronger
        // than the reference's one-file-per-chrom layout). _shard
        // leads the sort so the write's required ordering (partition
        // columns first) is already satisfied and the planner does
        // NOT insert its own partition-only sort, which is not
        // order-preserving for the trailing keys. The in-file sort
        // key is (chrom, start) for every positional entity EXCEPT
        // exon, which the reference sorts by (transcript_id, start)
        // inside its chrom shards (cache_builder.rs:1874-1879
        // sort_key — exon lookups probe by transcript).
        val sortKey: Seq[org.apache.spark.sql.Column] =
          if (entity == "exon" && df.columns.contains("transcript_id"))
            Seq(col("transcript_id"), col("start"))
          else Seq(col("chrom"), col("start"))
        val rows = dedupKeys(entity, df) match {
          case Some(keys) => dedupBy(df, keys)
          case None => df
        }
        val keyed = rows.withColumn("chrom", bare(col("chrom")))
          .withColumn("_shard", shardCol(col("chrom")))
          .repartitionByRange((col("_shard") +: sortKey): _*)
          .sortWithinPartitions((col("_shard") +: sortKey): _*)
        writerFor(keyed, entity).partitionBy("_shard").parquet(path)
      } else {
        // the `translation` entity dedups to one row per transcript
        // (cache_builder.rs build_translation_*); sift/polyphen
        // matrices are many rows per transcript and only re-sort
        // (the reference's translation_sift second pass)
        val rows = dedupKeys(entity, df) match {
          case Some(keys) => dedupBy(df, keys)
          case None => df
        }
        val keyed = rows
          .repartitionByRange(col("transcript_id"))
          .sortWithinPartitions(col("transcript_id"))
        writerFor(keyed, entity).parquet(path)
      }
    }
  }

  /** Ensembl VEP caches duplicate a transcript whose span crosses a
    * region boundary into BOTH region files; the reference's
    * translation build keeps ONE row per transcript_id, preferring
    * the row from the transcript's HOME region file, then the lowest
    * cdna_coding_start (NULLS LAST), then source_file
    * (cache_builder.rs:77-88 build_translation_dedup_query). The
    * region-preference term needs the raw cache's `source_file`
    * provenance — applied when the column is present, and the whole
    * dedup is skipped for inputs without duplicates either way.
    * Region size is the public Ensembl cache convention: 1 Mb files
    * named `{start}-{end}.gz`. */
  private val RegionSizeBp = 1000000L

  /** Dedup partition keys per entity, or None for entities that keep
    * every row. Pinned by the reference's export-query tests (the
    * builder function itself lives in the external format crate):
    * transcript -> stable_id (cache_builder.rs:2421-2434;
    * `transcript_id` accepted as the synonym when the frame uses the
    * repo's column convention), exon -> (transcript_id, exon_number)
    * (rs:2470-2477), translation -> transcript_id (rs:77-88);
    * variation is `SELECT *` — never deduped (rs:2406-2409), and the
    * sift/polyphen matrices are many rows per transcript. Keys only
    * apply when the frame actually has them. */
  private def dedupKeys(entity: String, df: DataFrame): Option[Seq[String]] = {
    def has(c: String) = df.columns.contains(c)
    entity match {
      case "transcript" if has("stable_id") => Some(Seq("stable_id"))
      case "transcript" if has("transcript_id") => Some(Seq("transcript_id"))
      case "exon" if has("transcript_id") && has("exon_number") =>
        Some(Seq("transcript_id", "exon_number"))
      case "translation" => Some(Seq("transcript_id"))
      case _ => None
    }
  }

  private def dedupBy(df: DataFrame, keys: Seq[String]): DataFrame = {
    val ord = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Column]()
    if (df.columns.contains("source_file") && df.columns.contains("start")) {
      val rs = floor((col("start") - 1) / RegionSizeBp.toDouble).cast("long") *
        RegionSizeBp + 1
      val re = rs + (RegionSizeBp - 1)
      ord += when(col("source_file").endsWith(concat(lit("/"),
        rs.cast("string"), lit("-"), re.cast("string"), lit(".gz"))), 0)
        .otherwise(1)
    }
    if (df.columns.contains("cdna_coding_start"))
      ord += col("cdna_coding_start").asc_nulls_last
    if (df.columns.contains("source_file")) ord += col("source_file")
    if (ord.isEmpty) {
      // the reference's dedup queries always carry tie-break columns
      // (cache_builder.rs:77-88); without them the partition key alone
      // would let row_number pick an ARBITRARY row per key — order by
      // every remaining column (name-sorted) so the pick is a pure
      // function of the data, invariant under partitioning
      ord ++= df.columns.filterNot(keys.contains).sorted
        .map(c => col(c).asc_nulls_last)
      if (ord.isEmpty) ord += col(keys.head) // keys-only frame
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(ord.toSeq: _*)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  /** Build every entity, then the `variation` KV sink from the
    * written parquet (the reference's dual-sink lifecycle). Skip
    * semantics mirror the reference (cache_builder.rs:3518-3556):
    * with `overwrite = false`, an entity with existing parquet skips,
    * and the KV sink skips only when IT exists too — existing parquet
    * with a missing KV store rebuilds the KV FROM that parquet. */
  def buildAll(entities: Map[String, DataFrame], outDir: String,
      buildKv: Boolean = true, onProgress: OnProgress = null,
      overwrite: Boolean = false): Map[String, Long] = {
    val written = entities.map { case (entity, df) =>
      entity -> buildEntity(df, outDir, entity, onProgress, overwrite)
    }
    val kvPath = s"$outDir/variation.kv"
    if (buildKv && (overwrite || !dirHasParquet(kvPath)))
      entities.get("variation").foreach { v =>
        val rebuilt = openEntity(v.sparkSession, outDir, "variation")
        withRowProgress(v.sparkSession, "variation", "kv", onProgress) {
          graft.sources.PositionCache.write(rebuilt, kvPath)
        }
      }
    written
  }

  /** Read an entity back. The `_shard` directory key is layout, not
    * data — dropped; chrom stays the stored string column. */
  def openEntity(spark: SparkSession, outDir: String, entity: String): DataFrame = {
    val df = spark.read.parquet(s"$outDir/$entity")
    if (df.columns.contains("_shard")) df.drop("_shard") else df
  }

  /** Run `write` with a listener summing task output records —
    * Spark's driver-side equivalent of the reference's per-batch
    * progress hook; zero cost on the write path itself. Rows from
    * unrelated concurrent jobs in the same SparkContext would be
    * counted too — acceptable for a build utility, documented. */
  private def withRowProgress(spark: SparkSession, entity: String,
      format: String, onProgress: OnProgress)(write: => Unit): Long = {
    val total = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.outputMetrics != null) {
          val n = m.outputMetrics.recordsWritten
          if (n > 0) {
            val cum = total.addAndGet(n)
            if (onProgress != null) onProgress(entity, format, cum)
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try write
    finally {
      // the listener bus is async: the queued task-end events must
      // drain before detaching or the returned total undercounts. Two
      // equal reads 25 ms apart were NOT a drain proof — a loaded
      // driver's bus can lull longer than that mid-queue (round-14
      // ADVICE: latent flake) — so ask the bus itself:
      // LiveListenerBus.waitUntilEmpty blocks until every queue is
      // drained (private[spark] in source, public in bytecode —
      // invoked reflectively; zero wait when already empty). Fallback
      // if the accessor ever moves: counter stable across four reads
      // 50 ms apart.
      val drained =
        try {
          val sc = spark.sparkContext
          val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
          bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
            .invoke(bus, java.lang.Long.valueOf(20000L))
          true
        } catch { case _: Throwable => false }
      if (!drained) {
        var prev = -1L
        var stable = 0
        var spins = 0
        while (stable < 3 && spins < 400) {
          val cur = total.get()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
          Thread.sleep(50); spins += 1
        }
      }
      spark.sparkContext.removeSparkListener(listener)
    }
    if (onProgress != null) onProgress(entity, format, total.get())
    total.get()
  }
}
