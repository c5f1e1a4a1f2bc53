package graft

import graft.vep.HgncPropagation.propagateHgnc

/** Pins `propagateHgnc` to the reference's unit tests for
  * `apply_buffer_local_hgnc_propagation`
  * (annotate_provider.rs:9478-9545) — the runtime gene-metadata fill
  * the cache build deliberately omits (cache_builder.rs:2445-2467). */
class HgncPropagationSuite extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(String, Long, String, String, String, String, String, String)]) =
    rows.toDF("chrom", "start", "transcript_id", "gene_stable_id",
      "gene_symbol", "gene_symbol_source", "gene_hgnc_id_native", "gene_hgnc_id")

  private def byTx(df: org.apache.spark.sql.DataFrame) =
    df.select($"transcript_id", $"gene_symbol", $"gene_symbol_source", $"gene_hgnc_id")
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3))))).toMap

  test("native-id holder donates to same-symbol transcripts missing an id") {
    // annotate_provider.rs:9478-9499 (NBAS): the Ensembl transcript
    // carries the native HGNC id; the same-symbol RefSeq transcript
    // with no id borrows it
    val tx = frame(Seq(
      ("1", 1L, "ENST00000919191", "ENSG00000182158", "NBAS", "HGNC", "HGNC:15625", null),
      ("1", 2L, "XR_007076390.1", "GENE:NBAS", "NBAS", "EntrezGene", null, null)))
    val got = byTx(propagateHgnc(tx))
    assert(got("XR_007076390.1")._3.contains("HGNC:15625"))
    assert(got("ENST00000919191")._3.contains("HGNC:15625"))
  }

  test("cache-promoted effective ids keep working but never donate") {
    // annotate_provider.rs:9501-9523 (ANAPC1P1): a transcript whose
    // effective id was promoted by the cache (native NULL) must not
    // seed propagation — the RefSeq sibling stays id-less
    val tx = frame(Seq(
      ("1", 1L, "ENST00000426186", "ENSG00000225475", "ANAPC1P1", "HGNC", null, "HGNC:44150"),
      ("1", 2L, "NR_037931.2", "GENE:ANAPC1P1", "ANAPC1P1", "EntrezGene", null, null)))
    val got = byTx(propagateHgnc(tx))
    assert(got("NR_037931.2")._3.isEmpty,
      "cache-promoted HGNC IDs must not seed VEP-style propagation")
    assert(got("ENST00000426186")._3.contains("HGNC:44150"),
      "the promoted id keeps working for its own transcript")
  }

  test("same gene_stable_id refills missing symbol, source, and id") {
    // annotate_provider.rs:9525-9545 (BRCA1): a bare same-gene
    // transcript inherits the gene's first-seen symbol/source/native id
    val tx = frame(Seq(
      ("1", 1L, "ENST00000111111", "ENSG00000123456", "BRCA1", "HGNC", "HGNC:1100", null),
      ("1", 2L, "ENST00000222222", "ENSG00000123456", null, null, null, null)))
    val got = byTx(propagateHgnc(tx))
    assert(got("ENST00000222222") ==
      ((Some("BRCA1"), Some("HGNC"), Some("HGNC:1100"))))
  }

  test("buffers never leak: donor on one chrom cannot fill another") {
    val tx = frame(Seq(
      ("1", 1L, "T1", "G1", "SYMX", "HGNC", "HGNC:7", null),
      ("2", 1L, "T2", "G2", "SYMX", "EntrezGene", null, null)))
    val got = byTx(propagateHgnc(tx))
    assert(got("T2")._3.isEmpty, "propagation is buffer-local")
  }

  test("first donor in buffer order wins on symbol conflicts") {
    val tx = frame(Seq(
      ("1", 5L, "T2", "G2", "SYM", "HGNC", "HGNC:2", null),
      ("1", 1L, "T1", "G1", "SYM", "HGNC", "HGNC:1", null),
      ("1", 9L, "T3", "G3", "SYM", "EntrezGene", null, null)))
    val got = byTx(propagateHgnc(tx))
    assert(got("T3")._3.contains("HGNC:1"), "lowest (start, transcript_id) donates")
  }
}
