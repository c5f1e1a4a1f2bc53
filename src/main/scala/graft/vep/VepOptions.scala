package graft.vep

/** The reference's `annotate_vep(..., options_json)` option surface
  * (annotate_provider.rs:1110-1163 `VepFlags::from_options_json`, plus
  * the `distance` option its own test exercises): flag names and the
  * implication rules mirror Ensembl VEP's Config.pm — `--everything`
  * turns on the whole AF family + pubmed, and any AF/pubmed flag
  * implies `--check_existing`. `refseq`/`merged` pick the
  * transcript-source CSQ layout ([[Annotate.csqFieldNamesForMode]]);
  * `everything=false` renders the 74-field default layout
  * (golden_benchmark.rs CSQ_FIELD_NAMES).
  *
  * This library's default is the `--everything` profile (the shape
  * every e2e gate runs); the reference's default is all-flags-off. */
final case class VepOptions(
    everything: Boolean = true,
    af: Boolean = false,
    af1kg: Boolean = false,
    afGnomade: Boolean = false,
    afGnomadg: Boolean = false,
    maxAf: Boolean = false,
    pubmed: Boolean = false,
    checkExisting: Boolean = false,
    hgvs: Boolean = false,
    hgvsc: Boolean = false,
    hgvsp: Boolean = false,
    refseq: Boolean = false,
    merged: Boolean = false,
    allRefseq: Boolean = false,
    excludePredicted: Boolean = false,
    gencodeBasic: Boolean = false,
    gencodePrimary: Boolean = false,
    shiftHgvs: Boolean = true,
    /** Richer per-motif rendering (library extension, OFF by default):
      * one Feature row per overlapped motif with populated MOTIF_NAME/
      * MOTIF_POS/HIGH_INF_POS/MOTIF_SCORE_CHANGE/TRANSCRIPTION_FACTORS
      * slots, real-VEP style. The DEFAULT matches the reference
      * exactly: ONE anonymous MotifFeature entry per variant
      * overlapping any motif, with all five motif CSQ slots empty
      * (transcript_consequence.rs append_tfbs_terms_prepared builds
      * `TranscriptConsequence { feature_type: MotifFeature, terms,
      * ..Default }` — no feature id, no motif metadata; the
      * annotate_provider.rs CSQ format strings end `...|||||`).
      * Library-extension options_json key: `motif_rich`. */
    motifRich: Boolean = false,
    distance: Long = 5000L) {
  /** HGVS gating (annotate_provider.rs:1180-1205 HgvsFlags):
    * `--everything` implies `--hgvs`, which implies both forms.
    * `shift_hgvs: false` disables the 3'-shift wherever HGVS renders
    * (genomic indel anchors, the peptide-level shift, and the
    * HGVS_OFFSET slot, which then never emits). The reference's
    * default is `hgvsc || hgvsp` — observationally identical to a
    * plain `true` here, since the flag is only consulted when an
    * HGVS form actually renders. */
  def hgvscOn: Boolean = everything || hgvs || hgvsc
  def hgvspOn: Boolean = everything || hgvs || hgvsp
  def afOn: Boolean = everything || af
  def af1kgOn: Boolean = everything || af1kg
  def afGnomadeOn: Boolean = everything || afGnomade
  def afGnomadgOn: Boolean = everything || afGnomadg
  def maxAfOn: Boolean = everything || maxAf
  def pubmedOn: Boolean = everything || pubmed
  /** VEP behavior: AF flags imply `--check_existing`. */
  def checkExistingOn: Boolean =
    checkExisting || afOn || af1kgOn || afGnomadeOn || afGnomadgOn ||
      maxAfOn || pubmedOn

  /** AF flag-group of a cache column (annotate_provider.rs AF_COLUMNS
    * `flag_group`): the global 'af', the 1000G populations, the
    * gnomAD-exomes family (cache column af_gnomad = gnomADe_AF), the
    * gnomAD-genomes family. Disabled groups render empty CSQ slots
    * and null variant-level values. */
  def groupOn(cacheCol: String): Boolean =
    if (cacheCol == "af") afOn
    else if (cacheCol == "af_gnomadg" || cacheCol.startsWith("af_gnomadg_")) afGnomadgOn
    else if (cacheCol == "af_gnomad" || cacheCol.startsWith("af_gnomade_")) afGnomadeOn
    else af1kgOn
}

object VepOptions {
  /** The `--everything` profile (this library's default). */
  val Everything: VepOptions = VepOptions()

  /** The reference's own default: every flag off — transcript
    * consequences only, no colocated-variant lookup. */
  val Default: VepOptions = VepOptions(everything = false)

  /** Parse the reference's `options_json` argument (boolean flags by
    * VEP CLI name + numeric `distance`). Unknown keys are ignored,
    * matching the reference's per-key probing — but over the actual
    * JSON STRUCTURE (top-level keys of the options object), not a
    * textual scan: a flag name appearing inside a string value or a
    * nested object does NOT set the flag. Uses the Jackson parser
    * Spark itself ships. */
  def fromJson(json: String): VepOptions = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def flag(k: String): Boolean = {
      val v = node.get(k)
      v != null && v.isBoolean && v.booleanValue()
    }
    val dist = Option(node.get("distance"))
      .filter(_.isNumber).map(_.longValue()).getOrElse(5000L)
    VepOptions(
      everything = flag("everything"),
      af = flag("af"), af1kg = flag("af_1kg"),
      afGnomade = flag("af_gnomade"), afGnomadg = flag("af_gnomadg"),
      maxAf = flag("max_af"), pubmed = flag("pubmed"),
      checkExisting = flag("check_existing"),
      hgvs = flag("hgvs"), hgvsc = flag("hgvsc"), hgvsp = flag("hgvsp"),
      refseq = flag("refseq"), merged = flag("merged"),
      allRefseq = flag("all_refseq"),
      excludePredicted = flag("exclude_predicted"),
      gencodeBasic = flag("gencode_basic"),
      gencodePrimary = flag("gencode_primary"),
      // default ON (reference: unwrap_or(hgvsc || hgvsp)); only an
      // explicit boolean false disables
      shiftHgvs = Option(node.get("shift_hgvs"))
        .filter(_.isBoolean).forall(_.booleanValue()),
      motifRich = flag("motif_rich"),
      distance = dist)
  }
}
