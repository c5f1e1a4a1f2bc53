package graft.vep

/** Codon-level consequence machinery for SNVs in coding sequence —
  * the first codon/protein layer of the reference's
  * TranscriptConsequenceEngine (transcript_consequence.rs; SO terms
  * stop_gained/stop_lost/missense/synonymous at ranks 3/5/12/21 in
  * so_terms.rs:58-100).
  *
  * The reference reads genomic sequence from FASTA; this container
  * ships none, so the reference sequence is DERIVED deterministically:
  * `base(chrom,pos) = 'ACGT'[hexdigit(md5(chrom||':'||pos)) mod 4]`.
  * Both engines (Spark for execution, DuckDB for the oracle) compute
  * the identical sequence, which makes the codon pipeline — codon
  * addressing, strand-aware reverse complement, translation, term
  * assignment — fully verifiable even without a real genome. Swapping
  * in FASTA-backed bases later only replaces the `seq` fragment.
  *
  * Simplification (documented): the CDS is treated as a contiguous
  * genomic span (no intron-aware cDNA mapping yet — that is the next
  * F11 phase).
  */
object CodonLogic {

  /** Standard genetic code, DNA alphabet, '*' = stop. */
  val codonTable: Map[String, String] = {
    val bases = "TCAG"
    val aas = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
    (for {
      (b1, i1) <- bases.zipWithIndex
      (b2, i2) <- bases.zipWithIndex
      (b3, i3) <- bases.zipWithIndex
    } yield s"$b1$b2$b3" -> aas(i1 * 16 + i2 * 4 + i3).toString).toMap
  }

  sealed trait Dialect {
    def castStr: String
    def hexDigit(inner: String): String
    /** 1-based position of `sub` in `str`, 0 when absent. */
    def strIndex(str: String, sub: String): String
  }
  case object SparkD extends Dialect {
    val castStr = "STRING"
    def hexDigit(inner: String): String = s"CAST(conv($inner, 16, 10) AS INT)"
    def strIndex(str: String, sub: String): String = s"instr($str, $sub)"
  }
  case object DuckD extends Dialect {
    val castStr = "VARCHAR"
    def hexDigit(inner: String): String = s"CAST(strpos('0123456789abcdef', $inner) - 1 AS INT)"
    def strIndex(str: String, sub: String): String = s"strpos($str, $sub)"
  }

  /** The 64 amino acids in TCAG-nested codon order (index =
    * 16*b1 + 4*b2 + b3 with T=0 C=1 A=2 G=3). */
  val aaString: String =
    "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"

  /** Derived reference base at (chrom, pos). */
  def seq(d: Dialect, chrom: String, pos: String): String = {
    val digit = d.hexDigit(s"substr(md5(concat($chrom, ':', CAST($pos AS ${d.castStr}))), 1, 1)")
    s"substr('ACGT', 1 + $digit % 4, 1)"
  }

  /** JVM-side evaluation of [[seq]] — bit-identical to the SQL
    * fragment on both engines (same md5-hex first digit mod 4). Used
    * by bounded per-row scans (3'-shift, dup context) that are
    * imperative loops in the reference too; expressing them as Spark
    * HOF expression trees made the plan ~300 KB per probe column and
    * pinned their interpreted evaluation into single-partition scan
    * stages (round-3 bench). */
  def baseAt(chrom: String, pos: Long): Char = {
    val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(chrom + ":" + pos)
    val c = h.charAt(0)
    val digit = if (c <= '9') c - '0' else c - 'a' + 10
    "ACGT".charAt(digit % 4)
  }

  /** JVM-side 3'-shift scan, mirroring [[Splice.shiftScanSql]]:
    * 1-based index of the first position in [anchor, anchor+max) whose
    * derived base differs from `allele`, 0 when all match. */
  def shiftScan(chrom: String, anchor: Long, allele: Char, max: Int): Long = {
    var j = 0
    while (j < max) {
      if (baseAt(chrom, anchor + j) != allele) return j + 1L
      j += 1
    }
    0L
  }

  /** Reverse complement (both engines share reverse + translate). */
  def rc(x: String): String = s"reverse(translate($x, 'ACGT', 'TGCA'))"

  /** Translate a codon SQL string to an amino acid by indexing into
    * [[aaString]] — pure arithmetic instead of a 64-way CASE (which
    * exceeds whole-stage-codegen limits and falls back to interpreted
    * eval; this stays codegen'd). Dialect only differs in the
    * substring-position function name. */
  def aa(d: Dialect, codonSql: String): String = {
    def pos(i: Int) = s"(${d.strIndex("'TCAG'", s"substr($codonSql, $i, 1)")} - 1)"
    s"substr('$aaString', 1 + ${pos(1)} * 16 + ${pos(2)} * 4 + ${pos(3)}, 1)"
  }

  /** SQL fragments for the effective (strand-aware) ref/alt CODONS of
    * an SNV at `vs` inside a contiguous CDS starting at `cs` on
    * `chrom` with `strand` (+1/-1) and alt allele `alt`. Materialize
    * these as columns, then apply [[aa]] to the column names — that
    * keeps the md5-bearing codon expression evaluated once. All
    * argument strings are column references valid in the target query
    * scope. */
  def codons(d: Dialect, chrom: String, vs: String, cs: String,
      strand: String, alt: String): (String, String) = {
    val c0 = s"($cs + (($vs - $cs) DIV 3) * 3)"
    val off = s"(($vs - $cs) % 3)"
    val b = (i: Int) => seq(d, chrom, s"($c0 + $i)")
    val refCodon = s"concat(${b(0)}, ${b(1)}, ${b(2)})"
    val altCodon =
      s"(CASE $off WHEN 0 THEN concat($alt, ${b(1)}, ${b(2)}) " +
      s"WHEN 1 THEN concat(${b(0)}, $alt, ${b(2)}) " +
      s"ELSE concat(${b(0)}, ${b(1)}, $alt) END)"
    val eff = (c: String) => s"(CASE WHEN $strand = 1 THEN $c ELSE ${rc(c)} END)"
    (eff(refCodon), eff(altCodon))
  }

  /** DuckDB spells integer division differently. */
  def fixDiv(d: Dialect, sql: String): String =
    if (d == DuckD) sql.replace(" DIV ", " // ") else sql
}
