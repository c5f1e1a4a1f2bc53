package graft

import graft.vep.{Annotate, SchemaContract, Vep}

/** Variation-cache schema-contract validation
  * (schema_contract.rs:10-90): required columns and types are checked
  * eagerly at every cache-consuming public entry, with the reference's
  * error text; the string family is interchangeable. */
class SchemaContractSuite extends SparkSpec {
  import spark.implicits._

  private def goodCache = Seq(
    ("chr1", 100L, 100L, "rs1", "A/C"))
    .toDF("chrom", "start", "end", "variation_name", "allele_string")

  private def vcf = Seq(("chr1", 100L, 100L, 1L, "A", "C"))
    .toDF("chrom", "start", "end", "id", "ref", "alt")

  test("valid cache schema passes; extra columns ignored") {
    SchemaContract.validateVariationCache(goodCache)
    SchemaContract.validateVariationCache(
      goodCache.selectExpr("*", "0.5 AS af", "'benign' AS clin_sig"))
  }

  test("missing required column fails with the reference's error text") {
    val e = intercept[IllegalArgumentException] {
      SchemaContract.validateVariationCache(goodCache.drop("variation_name"))
    }
    assert(e.getMessage.contains(
      "missing required column 'variation_name'"))
    assert(e.getMessage.contains(
      "Required columns: chrom, start, end, variation_name, allele_string"))
  }

  test("wrong coordinate type fails; the error names actual and expected") {
    val intStart = goodCache.selectExpr(
      "chrom", "CAST(start AS INT) AS start", "end",
      "variation_name", "allele_string")
    val e = intercept[IllegalArgumentException] {
      SchemaContract.validateVariationCache(intStart)
    }
    assert(e.getMessage.contains("column 'start' has type INT"))
    assert(e.getMessage.contains("expected BIGINT"))
    // a numeric chrom is a type violation too, not string-compatible
    val numChrom = goodCache.selectExpr(
      "CAST(1 AS BIGINT) AS chrom", "start", "end",
      "variation_name", "allele_string")
    intercept[IllegalArgumentException] {
      SchemaContract.validateVariationCache(numChrom)
    }
  }

  test("string-family compatibility: collated strings satisfy Utf8") {
    // the reference accepts Utf8/Utf8View/LargeUtf8 interchangeably;
    // Spark's analogue is StringType under any collation
    val collated = goodCache.selectExpr(
      "collate(chrom, 'UTF8_LCASE') AS chrom", "start", "end",
      "variation_name", "collate(allele_string, 'UNICODE') AS allele_string")
    SchemaContract.validateVariationCache(collated)
  }

  test("public entries fail eagerly, before any job runs") {
    val bad = goodCache.drop("allele_string")
    intercept[IllegalArgumentException] {
      Vep.lookupVariants(vcf, bad)
    }
    intercept[IllegalArgumentException] {
      Annotate.colocated(vcf, bad)
    }
    val tx = Seq.empty[(String, Long, Long, String, Int, String, Long, Long,
      String, String, String, String)]
      .toDF("chrom", "start", "end", "transcript_id", "strand", "biotype",
        "cds_start", "cds_end", "gene_id", "symbol", "canonical", "flags")
    val ex = Seq.empty[(String, Long, Long)].toDF("transcript_id", "start", "end")
    val ctx = Seq.empty[(String, Long, String, Double)]
      .toDF("transcript_id", "protein_pos", "aa", "sift_score")
    val ctp = Seq.empty[(String, Long, String, Double)]
      .toDF("transcript_id", "protein_pos", "aa", "polyphen_score")
    val reg = Seq.empty[(String, Long, Long, String)]
      .toDF("chrom", "start", "end", "feature_id")
    val mot = Seq.empty[(String, Long, Long, String, String, Double)]
      .toDF("chrom", "start", "end", "motif_id", "tf_name", "score_change")
    intercept[IllegalArgumentException] {
      Annotate.annotate(vcf, bad, tx, ex, ctx, ctp, reg, mot)
    }
  }

  test("requested-columns validation names the missing column and lists available") {
    val cache = goodCache.selectExpr("*", "0.5 AS af")
    val e = intercept[IllegalArgumentException] {
      Vep.lookupVariants(vcf, cache, columns = Seq("af", "nope"))
    }
    assert(e.getMessage.contains("Requested column 'nope' not found"))
    assert(e.getMessage.contains("Available columns:"))
    assert(e.getMessage.contains("af"))
    // valid request still works end-to-end
    assert(Vep.lookupVariants(vcf, cache, columns = Seq("af"))
      .columns.contains("cache_af"))
  }
}
