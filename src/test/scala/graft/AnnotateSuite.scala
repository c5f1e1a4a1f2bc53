package graft

import graft.vep.Annotate

/** Element-wise coverage of [[Annotate.annotateTyped]]'s parallel
  * array columns (round-6 ADVICE: the arrays were only checked through
  * the '|'-serialized gate projection, where a delimiter collision
  * could mask an element-boundary difference). The typed arrays must
  * decompose EXACTLY like [[Annotate.annotate]]'s CSQ entry fields —
  * same order (the shared entry-string sort key), same values — so the
  * cross-check here parses the gated CSQ string and compares field by
  * field, element by element. */
class AnnotateSuite extends SparkSpec {
  import spark.implicits._

  // entry-string field positions (Annotate.entriesDf rendering)
  private val FEATURE = 0
  private val CONSEQUENCE = 1
  private val HGVSC = 5
  private val HGVSP = 6
  private val SIFT = 7
  private val POLYPHEN = 8
  private val IMPACT = 9
  private val ALLELE = 16
  private val FTYPE = 17
  private val GENE = 18
  private val SYMBOL = 19
  private val CANONICAL = 20
  private val EXON = 22
  private val EXISTING = 24
  private val MOTIF_NAME = 25
  private val N_FIELDS = 32

  test("annotateTyped arrays align element-wise with annotate CSQ entries") {
    // variant 1 overlaps one transcript + one regulatory feature + one
    // motif (3 entries); variant 2 sits on a contig with no features
    // at all (0 entries — chr1:50 would still be within the 5000bp
    // upstream reach of T1)
    val vcf = Seq(
      ("chr1", 1205L, 1205L, 1L, "A", "C"),
      ("chr2", 50L, 50L, 2L, "A", "G"),
    ).toDF("chrom", "start", "end", "id", "ref", "alt")
    val cache = Seq(
      ("chr1", 1205L, 1205L, "rs1", "A/C", 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, "benign"),
    ).toDF("chrom", "start", "end", "variation_name", "allele_string",
      "af", "af_afr", "af_amr", "af_eas", "af_eur", "af_sas", "af_gnomad", "clin_sig")
    val tx = Seq(
      ("chr1", 1000L, 1999L, "T1", 1, "protein_coding", 1100L, 1900L,
        "G1", "SYM1", "YES", ""),
    ).toDF("chrom", "start", "end", "transcript_id", "strand", "biotype",
      "cds_start", "cds_end", "gene_id", "symbol", "canonical", "flags")
    val ex = Seq(("T1", 1000L, 1399L), ("T1", 1400L, 1699L), ("T1", 1700L, 1999L))
      .toDF("transcript_id", "start", "end")
    val sift = Seq(("T1", 1L, "A", 0.5)).toDF("transcript_id", "protein_pos", "aa", "sift_score")
    val pp = Seq(("T1", 1L, "A", 0.5)).toDF("transcript_id", "protein_pos", "aa", "polyphen_score")
    val reg = Seq(("chr1", 1200L, 1210L, "R1", "promoter"))
      .toDF("chrom", "start", "end", "feature_id", "feature_type")
    val mot = Seq(("chr1", 1204L, 1215L, "M1", "CTCF"))
      .toDF("chrom", "start", "end", "motif_id", "tf_name")

    val typed = Annotate.annotateTyped(vcf, cache, tx, ex, sift, pp, reg, mot)
      .collect().map(r => r.getLong(r.fieldIndex("id")) -> r).toMap
    val plain = Annotate.annotate(vcf, cache, tx, ex, sift, pp, reg, mot)
      .collect().map(r => r.getLong(r.fieldIndex("id")) -> r).toMap

    def arr(id: Long, name: String): Seq[String] = {
      val r = typed(id)
      r.getSeq[String](r.fieldIndex(name))
    }
    def entries(id: Long): Array[Array[String]] = {
      val r = plain(id)
      val csq = r.getString(r.fieldIndex("csq"))
      if (csq.isEmpty) Array.empty
      else csq.split(",").map(_.split("\\|", -1))
    }

    val e1 = entries(1L)
    assert(e1.length == 3)
    assert(e1.forall(_.length == N_FIELDS))
    assert(e1.map(_(FEATURE)).toSet == Set("T1", "R1", "M1"))
    // --everything family spot checks on the transcript entry
    val t1e = e1.find(_(FEATURE) == "T1").get
    assert(t1e(ALLELE) == "C")
    assert(t1e(FTYPE) == "Transcript")
    assert(t1e(GENE) == "G1" && t1e(SYMBOL) == "SYM1" && t1e(CANONICAL) == "YES")
    assert(t1e(EXON) == "1/3")      // pos 1205 is in exon 1 of 3, '+' strand
    assert(t1e(EXISTING) == "rs1")  // threaded from the shared lookup
    val m1e = e1.find(_(FEATURE) == "M1").get
    assert(m1e(FTYPE) == "MotifFeature" && m1e(MOTIF_NAME) == "CTCF")
    // every array column must match the corresponding CSQ field,
    // element for element, in the shared entry-sort order
    assert(arr(1L, "transcript_ids") == e1.map(_(FEATURE)).toSeq)
    assert(arr(1L, "consequences") == e1.map(_(CONSEQUENCE)).toSeq)
    assert(arr(1L, "hgvs_c") == e1.map(_(HGVSC)).toSeq)
    assert(arr(1L, "hgvs_p") == e1.map(_(HGVSP)).toSeq)
    assert(arr(1L, "sift") == e1.map(_(SIFT)).toSeq)
    assert(arr(1L, "polyphen") == e1.map(_(POLYPHEN)).toSeq)
    assert(arr(1L, "impact") == e1.map(_(IMPACT)).toSeq)
    // semantic spot-checks on known entries
    val regIdx = e1.indexWhere(_(FEATURE) == "R1")
    assert(arr(1L, "consequences")(regIdx) == "regulatory_region_variant")
    assert(arr(1L, "impact")(regIdx) == "MODIFIER")
    val motIdx = e1.indexWhere(_(FEATURE) == "M1")
    assert(arr(1L, "consequences")(motIdx) == "TF_binding_site_variant")
    // variant-level columns agree between the two shapes
    val t1 = typed(1L); val p1 = plain(1L)
    assert(t1.getString(t1.fieldIndex("variation_name")) == "rs1")
    assert(p1.getString(p1.fieldIndex("variation_name")) == "rs1")
    assert(t1.getLong(t1.fieldIndex("n_transcripts")) == 3L)
    // MAX_AF spans population columns only (global af 0.1 excluded;
    // af_gnomad 0.7 is the population maximum)
    assert(t1.getDouble(t1.fieldIndex("max_af")) == 0.7)

    // no-entry variant: all arrays empty, csq empty
    assert(entries(2L).isEmpty)
    Seq("transcript_ids", "consequences", "hgvs_c", "hgvs_p", "sift",
      "polyphen", "impact").foreach(c => assert(arr(2L, c).isEmpty))
  }
}
