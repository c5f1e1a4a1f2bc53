package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pileup.Pileup
import graft.vep.Vep

/** Pileup (F9) + VEP lookup (F10) gate entries. */
object PileupVepQueries {
  import Oracle.{reads, vcf, vepCache}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f9_depth_blocks" -> ((s, d) =>
      Pileup.depth(Tables.reads(s, d)).orderBy("contig", "pos_start")),
    "f9_depth_perbase" -> ((s, d) =>
      Pileup.depthPerBase(Tables.reads(s, d)).orderBy("contig", "pos")),
    "f10_vep_allele" -> ((s, d) =>
      Tables.vcf(s, d).select(
        col("id"),
        Vep.vepRefUdf(col("ref"), col("alt")).as("vep_ref"),
        Vep.vepAltUdf(col("ref"), col("alt")).as("vep_alt"),
        Vep.vepNormStartUdf(col("start"), col("ref"), col("alt")).as("norm_start"),
        Vep.vepNormEndUdf(col("start"), col("ref"), col("alt")).as("norm_end"))),
    "f10_lookup_variants" -> ((s, d) =>
      Vep.lookupVariants(Tables.vcf(s, d), Tables.vepCache(s, d))),
  )

  /** Depth block CTE shared by the two pileup oracles: events → per-pos
    * delta sums → running coverage → RLE blocks (the SQL formulation of
    * SURVEY.md §2.5's event-list pipeline; the Spark side walks real
    * CIGAR strings, the oracle recomputes aligned length arithmetically
    * because the derived reads are single-M by construction). */
  private val blocksCte: String =
    s"""$reads,
       |ev AS (SELECT chrom, start AS pos, 1 AS d FROM reads WHERE (flags & 1796) = 0
       | UNION ALL SELECT chrom, start + rlen, -1 FROM reads WHERE (flags & 1796) = 0),
       |gpos AS (SELECT chrom, pos, SUM(d) AS d FROM ev GROUP BY chrom, pos),
       |cum AS (SELECT chrom, pos, SUM(d) OVER (PARTITION BY chrom ORDER BY pos) AS cov,
       |  LEAD(pos) OVER (PARTITION BY chrom ORDER BY pos) AS np FROM gpos),
       |blocks AS (SELECT chrom AS contig, pos AS pos_start, np - 1 AS pos_end,
       |  CAST(cov AS INT) AS coverage FROM cum WHERE cov <> 0 AND np IS NOT NULL)"""
      .stripMargin.replace("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "f9_depth_blocks" ->
      s"WITH $blocksCte SELECT contig, pos_start, pos_end, coverage FROM blocks ORDER BY contig, pos_start",
    "f9_depth_perbase" ->
      s"WITH $blocksCte SELECT contig, UNNEST(generate_series(pos_start, pos_end)) AS pos, coverage FROM blocks ORDER BY contig, pos",
    "f10_vep_allele" ->
      s"WITH $vcf SELECT id, vep_ref, vep_alt, norm_start, norm_end FROM v ORDER BY id",
    "f10_lookup_variants" ->
      s"""WITH $vcf, $vepCache
         |SELECT v.chrom, v.start, v.id, v.ref, v.alt,
         | c.variation_name AS cache_variation_name,
         | c.allele_string AS cache_allele_string,
         | c.af AS cache_af, c.clin_sig AS cache_clin_sig
         |FROM v LEFT JOIN c ON v.chrom = c.chrom
         | AND v.norm_start = c.start AND v.norm_end = c."end"
         | AND (split_part(c.allele_string, '/', 1) = v.vep_ref
         |      OR split_part(c.allele_string, '/', 1) = v.ref)
         | AND split_part(c.allele_string, '/', 2) = v.vep_alt
         |ORDER BY v.id""".stripMargin.replace("\n", " "),
  )
}
