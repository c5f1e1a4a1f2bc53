package graft.vep

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F10 `lookup_variants` — known-variant annotation
  * (bio-function-vep/src/lookup_provider.rs, variant_lookup_exec.rs),
  * re-expressed relationally (SURVEY.md §2 J6):
  *
  *   vcf LEFT JOIN cache
  *     ON chrom = cache.chrom
  *    AND vep_norm_start(pos,ref,alt) = cache.start
  *    AND vep_norm_end(pos,ref,alt)   = cache.end
  *   post-filtered by match_allele(ref, alt, cache.allele_string)
  *
  * The reference builds per-chromosome COITrees over the VCF and
  * streams the cache through them inside one custom ExecPlan; in Spark
  * the same computation is an equi-join on (chrom, norm coords) —
  * Catalyst plans a shuffled hash/sort-merge join that scales out, and
  * the allele matcher runs as a join-side predicate. Unmatched VCF rows
  * keep NULL cache columns (LEFT JOIN semantics,
  * variant_lookup_exec.rs:411-508).
  */
object Vep {

  /** Spark UDF handles (plain Scala UDFs — same extension point the
    * reference uses, allele.rs create_udf). */
  val vepNormStartUdf = udf((pos: Long, ref: String, alt: String) =>
    Allele.vepNormStart(pos, ref, alt))
  val vepNormEndUdf = udf((pos: Long, ref: String, alt: String) =>
    Allele.vepNormEnd(pos, ref, alt))
  val vepRefUdf = udf((ref: String, alt: String) => Allele.vcfToVepAllele(ref, alt)._1)
  val vepAltUdf = udf((ref: String, alt: String) => Allele.vcfToVepAllele(ref, alt)._2)
  val matchAlleleUdf = udf((ref: String, alt: String, alleleString: String) =>
    Allele.matches(ref, alt, alleleString))
  val matchAlleleRelaxedUdf = udf((ref: String, alt: String, alleleString: String) =>
    Allele.matchesRelaxed(ref, alt, alleleString))

  /** Register SQL-callable function names (lib.rs:91-102 equivalents). */
  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register("vep_norm_start", vepNormStartUdf)
    spark.udf.register("vep_norm_end", vepNormEndUdf)
    spark.udf.register("vep_ref", vepRefUdf)
    spark.udf.register("vep_alt", vepAltUdf)
    spark.udf.register("match_allele", matchAlleleUdf)
    spark.udf.register("match_allele_relaxed", matchAlleleRelaxedUdf)
  }

  /** Default output columns: all cache columns minus the join triple
    * and `source_*` bookkeeping (vep/src/table_function.rs:82-94). */
  private def defaultCacheCols(cache: DataFrame): Seq[String] =
    cache.columns.toSeq.filterNot(c =>
      c == "chrom" || c == "start" || c == "end" || c.startsWith("source_"))

  /** @param vcf    columns per FIXTURES.md §4 (chrom, start, ref, alt, …)
    * @param cache  columns per FIXTURES.md §5 (chrom, start, end,
    *               variation_name, allele_string, …)
    * @param columns cache columns to emit (`cache_*`-prefixed);
    *               default = all minus join/bookkeeping columns
    * @param relaxed use the indel-aware relaxed matcher */
  def lookupVariants(
      vcf: DataFrame, cache: DataFrame,
      columns: Seq[String] = Nil,
      relaxed: Boolean = false): DataFrame = {
    val outCols = if (columns.nonEmpty) columns else defaultCacheCols(cache)
    val matcher = if (relaxed) matchAlleleRelaxedUdf else matchAlleleUdf
    val v = vcf
      .withColumn("_norm_start", vepNormStartUdf(col("start").cast("long"), col("ref"), col("alt")))
      .withColumn("_norm_end", vepNormEndUdf(col("start").cast("long"), col("ref"), col("alt")))
    val c = cache.select(
      (Seq(col("chrom").as("_c_chrom"), col("start").cast("long").as("_c_start"),
           col("end").cast("long").as("_c_end"), col("allele_string").as("_c_allele_string")) ++
       outCols.map(n => col(n).as(s"_c_out_$n"))): _*)
    val joined = v.join(c,
      v("chrom") === c("_c_chrom") &&
      col("_norm_start") === col("_c_start") &&
      col("_norm_end") === col("_c_end") &&
      matcher(v("ref"), v("alt"), col("_c_allele_string")),
      "left")
    val out: Seq[Column] =
      vcf.columns.toSeq.map(col) ++ outCols.map(n => col(s"_c_out_$n").as(s"cache_$n"))
    joined.select(out: _*)
  }
}
