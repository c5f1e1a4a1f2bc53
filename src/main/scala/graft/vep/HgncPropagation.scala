package graft.vep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Buffer-local HGNC propagation — the runtime gene-metadata fill the
  * reference applies to each annotation buffer's transcript set
  * (annotate_provider.rs:7477-7548 `apply_buffer_local_hgnc_
  * propagation`, porting Ensembl VEP `Transcript::merge_features`).
  * The reference's cache build deliberately does NOT embed this fill
  * (cache_builder.rs:2445-2467 pins its absence from the export
  * query) — it is a runtime-only behavior, so it lives here as a
  * standalone relational operator over a transcripts frame.
  *
  * Semantics (pinned by annotate_provider.rs:9478-9545 tests):
  *   1. A transcript's effective `gene_hgnc_id` starts as its NATIVE
  *      id when present, else whatever effective value it already
  *      carried (a cache-promoted id keeps working for itself).
  *   2. ONLY native ids seed the symbol-donor map: the first
  *      transcript (buffer order) with both a symbol and a native id
  *      donates that id to every same-symbol transcript still missing
  *      one. A promoted-but-not-native id never donates
  *      (rs:9501-9523: "cache-promoted HGNC IDs must not seed
  *      VEP-style propagation").
  *   3. Per `gene_stable_id`, the first-seen non-null gene_symbol /
  *      gene_symbol_source / NATIVE hgnc id fill those fields on
  *      same-gene transcripts that lack them (rs:9525-9545).
  *
  * "Buffer" scope: the reference buffers one contig region window at
  * a time with stateful carry/prune rules across adjacent buffers
  * (annotate_provider.rs:9546+ `stateful_buffer_local_*` tests);
  * relationally the scope is the `bufferCols` grouping (default per
  * chrom — a superset of any buffer chain, equivalent for real
  * Ensembl data because a symbol belongs to one gene and a gene's
  * transcripts are co-located, so a chrom-wide donor map contains
  * exactly the region-windowed ones; callers needing literal region
  * scoping pass (chrom, region) bufferCols). "First" is the
  * reference's buffer order — cache
  * files are position-sorted — expressed deterministically as
  * (start, transcript_id). Aggregations are min_by over that key:
  * two small map-side-combined aggregates broadcast back onto the
  * frame, no per-buffer state, distributes at any scale. */
object HgncPropagation {

  private val OrdKey = "format_string('%020d|%s', start, transcript_id)"

  def propagateHgnc(tx0: DataFrame,
      bufferCols: Seq[String] = Seq("chrom")): DataFrame = {
    // a frame without a pre-existing effective column is the common
    // case (the reference's TranscriptFeature initializes it from the
    // native field); synthesize it as null-typed-like-native
    val tx =
      if (tx0.columns.contains("gene_hgnc_id")) tx0
      else tx0.withColumn("gene_hgnc_id",
        lit(null).cast(tx0.schema("gene_hgnc_id_native").dataType))
    val bc = bufferCols.map(col)
    // symbol -> first NATIVE id in buffer order (rule 2)
    val donors = tx
      .where(col("gene_hgnc_id_native").isNotNull && col("gene_symbol").isNotNull)
      .groupBy((bc :+ col("gene_symbol")): _*)
      .agg(expr(s"min_by(gene_hgnc_id_native, $OrdKey)").as("_sym_hgnc"))
    // gene_stable_id -> first-seen non-null fills (rule 3)
    val geneFill = tx
      .where(col("gene_stable_id").isNotNull)
      .groupBy((bc :+ col("gene_stable_id")): _*)
      .agg(
        expr(s"min_by(gene_symbol, $OrdKey) " +
          "FILTER (WHERE gene_symbol IS NOT NULL)").as("_g_sym"),
        expr(s"min_by(gene_symbol_source, $OrdKey) " +
          "FILTER (WHERE gene_symbol_source IS NOT NULL)").as("_g_src"),
        expr(s"min_by(gene_hgnc_id_native, $OrdKey) " +
          "FILTER (WHERE gene_hgnc_id_native IS NOT NULL)").as("_g_hgnc"))
    val eff0 = coalesce(col("gene_hgnc_id_native"), col("gene_hgnc_id")) // rule 1
    tx.join(broadcast(donors), bufferCols :+ "gene_symbol", "left")
      .join(broadcast(geneFill), bufferCols :+ "gene_stable_id", "left")
      .withColumn("_eff", coalesce(eff0, col("_sym_hgnc")))             // rule 2
      .select(
        (tx.columns.filterNot(Set("gene_hgnc_id", "gene_symbol",
            "gene_symbol_source").contains).map(col) ++ Seq(
          coalesce(col("gene_symbol"), col("_g_sym")).as("gene_symbol"),
          coalesce(col("gene_symbol_source"), col("_g_src")).as("gene_symbol_source"),
          coalesce(col("_eff"), col("_g_hgnc")).as("gene_hgnc_id"))): _*) // rule 3
  }
}
