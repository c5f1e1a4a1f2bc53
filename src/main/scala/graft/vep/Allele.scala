package graft.vep

/** VCF→VEP allele normalization + matching, mirroring the reference's
  * scalar UDF semantics (bio-function-vep/src/allele.rs, which itself
  * ports Ensembl VEP `Parser::VCF::create_VariationFeatures` /
  * ensembl-variation `trim_sequences()`):
  *
  *  - SNV pairs (both length 1) are returned untouched;
  *  - otherwise the shared prefix is trimmed; the shared suffix is
  *    trimmed only for INDELs (length-different pairs), never MNVs
  *    (allele.rs:283-330);
  *  - empty results render as "-";
  *  - normalized coordinates: start = pos + prefixLen,
  *    end = pos + len(ref) - 1 - suffixLen (start > end for
  *    insertions — VEP convention, allele.rs:751-773);
  *  - matching accepts multi-allelic ALT split on '|' or ',', compares
  *    against a "REF/ALT1/ALT2" cache allele string, left-first
  *    trimmed, with a right-first-trim fallback per cache allele
  *    (allele.rs:391-460).
  */
object Allele {

  /** (prefixLen, suffixLen) per VEP trim rules (allele.rs:703-732). */
  def prefixSuffixLen(ref: String, alt: String): (Int, Int) = {
    if (ref.length == 1 && alt.length == 1) return (0, 0)
    var p = 0
    val minLen = math.min(ref.length, alt.length)
    while (p < minLen && ref.charAt(p) == alt.charAt(p)) p += 1
    var s = 0
    if (ref.length != alt.length) {
      val refRem = ref.length - p
      val altRem = alt.length - p
      while (s < refRem && s < altRem &&
             ref.charAt(ref.length - 1 - s) == alt.charAt(alt.length - 1 - s)) s += 1
    }
    (p, s)
  }

  private def dash(s: String): String = if (s.isEmpty) "-" else s

  /** Minimal VEP (ref, alt) pair (allele.rs:283-330). */
  def vcfToVepAllele(ref: String, alt: String): (String, String) = {
    if (ref.length == 1 && alt.length == 1) return (ref, alt)
    val (p, s) = prefixSuffixLen(ref, alt)
    (dash(ref.substring(p, ref.length - s)), dash(alt.substring(p, alt.length - s)))
  }

  def vepNormStart(pos: Long, ref: String, alt: String): Long =
    pos + prefixSuffixLen(ref, alt)._1

  def vepNormEnd(pos: Long, ref: String, alt: String): Long =
    pos + ref.length - 1 - prefixSuffixLen(ref, alt)._2

  /** Right-first trim: shared suffix first, then shared prefix
    * (allele.rs:427-460). */
  def trimRightFirst(ref: String, alt: String): (String, String) = {
    var rEnd = ref.length; var aEnd = alt.length
    while (rEnd > 0 && aEnd > 0 && ref.charAt(rEnd - 1) == alt.charAt(aEnd - 1)) {
      rEnd -= 1; aEnd -= 1
    }
    var rStart = 0; var aStart = 0
    while (rStart < rEnd && aStart < aEnd && ref.charAt(rStart) == alt.charAt(aStart)) {
      rStart += 1; aStart += 1
    }
    (dash(ref.substring(rStart, rEnd)), dash(alt.substring(aStart, aEnd)))
  }

  /** Strict matcher (allele.rs:391-424). */
  def matches(vcfRef: String, vcfAlt: String, alleleString: String): Boolean = {
    val parts = alleleString.split('/')
    if (parts.isEmpty) return false
    val cacheRef = parts(0)
    val cacheAlts = parts.drop(1)
    vcfAlt.split(Array('|', ',')).iterator.filter(_.nonEmpty).exists { alt =>
      val (vepRef, vepAlt) = vcfToVepAllele(vcfRef, alt)
      val direct = (cacheRef == vepRef || cacheRef == vcfRef) && cacheAlts.contains(vepAlt)
      direct || cacheAlts.exists { ca =>
        val (tr, ta) = trimRightFirst(cacheRef, ca)
        tr == vepRef && ta == vepAlt
      }
    }
  }

  /** Canonical event lengths after prefix+suffix trim, '-' = empty
    * (allele.rs:505-545). */
  def canonicalEventLengths(ref0: String, alt0: String): (Int, Int) = {
    val ref = if (ref0 == "-") "" else ref0
    val alt = if (alt0 == "-") "" else alt0
    var rs = 0; var as = 0
    while (rs < ref.length && as < alt.length && ref.charAt(rs) == alt.charAt(as)) {
      rs += 1; as += 1
    }
    var re = ref.length; var ae = alt.length
    while (re > rs && ae > as && ref.charAt(re - 1) == alt.charAt(ae - 1)) {
      re -= 1; ae -= 1
    }
    (re - rs, ae - as)
  }

  /** Relaxed matcher: strict, else indel class + canonical length
    * compatibility (allele.rs:466-503). */
  def matchesRelaxed(vcfRef: String, vcfAlt: String, alleleString: String): Boolean = {
    if (matches(vcfRef, vcfAlt, alleleString)) return true
    val parts = alleleString.split('/')
    if (parts.isEmpty) return false
    val cacheRef = parts(0)
    val cacheAlts = parts.drop(1).filter(_.nonEmpty)
    if (cacheAlts.isEmpty) return false
    vcfAlt.split(Array('|', ',')).iterator.filter(_.nonEmpty).exists { alt =>
      val (vr, va) = canonicalEventLengths(vcfRef, alt)
      val vcfIns = vr == 0 && va > 0
      val vcfDel = vr > 0 && va == 0
      (vcfIns || vcfDel) && cacheAlts.exists { ca =>
        val (cr, cAlt) = canonicalEventLengths(cacheRef, ca)
        (vcfIns && cr == 0 && cAlt > 0 && va == cAlt) ||
        (vcfDel && cr > 0 && cAlt == 0 && vr == cr)
      }
    }
  }
}
