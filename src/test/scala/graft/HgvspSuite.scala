package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.vep.{CodonLogic, Hgvsp, Splice}

/** Hand-computed expectations for the protein-level indel HGVS
  * renderer (Hgvsp.proteinForm) over the derived genome — contiguous
  * CDS [1000, 1999] on chrom c1, both strands. */
class HgvspSuite extends AnyFunSuite {

  private val chrom = "c1"
  private val cs = 1000L
  private val ce = 1999L

  private def comp(c: Char): Char = "TGCA"("ACGT".indexOf(c))

  private def orig(idx: Long, strand: Int): Char =
    if (strand == 1) CodonLogic.baseAt(chrom, cs + idx)
    else comp(CodonLogic.baseAt(chrom, ce - idx))

  private def aaAt(c0: Long, strand: Int): String = {
    val codon = (0 to 2).map(j => orig(3 * c0 + j, strand)).mkString
    CodonLogic.codonTable(codon)
  }

  private def aa3(aa: String): String = {
    val i = Splice.aaAlpha.indexOf(aa.charAt(0))
    Splice.aa3Table.substring(i * 3, i * 3 + 3)
  }

  test("aligned 3-base deletion renders p.{Aaa}{pos}del on + strand") {
    // deleted genomic [cs+9, cs+11] = cds offsets 9-11 = codon 3 (pos 4)
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "del", "XXX", cs + 9, cs + 11)
    assert(got == s"${aa3(aaAt(3, 1))}4del")
  }

  test("aligned 3-base deletion renders the mirrored codon on - strand") {
    // '-' strand: e = ce - p1 = 9 -> same codon 3 in transcript order
    val got = Hgvsp.proteinForm(chrom, -1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "del", "XXX", ce - 11, ce - 9)
    assert(got == s"${aa3(aaAt(3, -1))}4del")
  }

  test("aligned 6-base deletion renders the range del form") {
    // codons 3 and 4 removed -> p.{Aaa}4_{Bbb}5del — unless the span
    // consumes the stop codon (residue 5 IS Ter on this derived
    // genome), in which case the stop-extension arm renders
    // p.{Aaa}4_Ter5?extTer{N} (hgvs.rs:1895-1920)
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "del", "X", cs + 9, cs + 14)
    val r1 = aaAt(3, 1); val r2 = aaAt(4, 1)
    if (r1 == "*" || r2 == "*") {
      val coding = codingStr(1)
      val newCoding = coding.substring(0, 9) + coding.substring(15)
      val oldStop1 = if (r1 == "*") 4 else 5
      val nStr = firstStopFrom(newCoding, 3)
        .map(c => (c + 1) - oldStop1).filter(_ > 0).map(_.toString).getOrElse("?")
      assert(got == s"${aa3(r1)}4_${aa3(r2)}5?extTer$nStr", s"got=$got")
    } else assert(got == s"${aa3(r1)}4_${aa3(r2)}5del")
  }

  test("codon-boundary insertion renders p.{Aaa}{m}_{Bbb}{m+1}ins{Seq}") {
    // insertion between cds offsets 8 and 9 = between residues 3 and 4;
    // inserted ACG translates to Thr
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "ins", "ACG", cs + 8, cs + 9)
    assert(got == s"${aa3(aaAt(2, 1))}3_${aa3(aaAt(3, 1))}4insThr")
  }

  test("frameshifting deletion renders fsTer/Ter at the right residue") {
    // 2-base deletion at codon 4 start (cds offsets 9-10): pos 4
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "del", "XX", cs + 9, cs + 10)
    assert(got != null)
    val ref = aaAt(3, 1)
    if (ref == "*") assert(got.startsWith("Ter4"))
    else {
      assert(got.startsWith(s"${aa3(ref)}4"))
      assert(got.contains("fsTer") || got.endsWith("Ter"))
    }
  }

  test("frameshift at a stop codon renders the extTer extension form") {
    // find a + strand codon whose reference residue is a stop and
    // whose post-insertion first codon is not
    val c0opt = (0L until 300L).find { c0 =>
      aaAt(c0, 1) == "*" && {
        val newCodon = "" + orig(3 * c0, 1) + 'C' + orig(3 * c0 + 1, 1)
        CodonLogic.codonTable(newCodon) != "*"
      }
    }
    assume(c0opt.nonEmpty)
    val c0 = c0opt.get
    // 1-base 'C' insertion after cds offset 3*c0 (inside the stop codon)
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "ins", "C", cs + 3 * c0, cs + 3 * c0 + 1)
    val newAA = CodonLogic.codonTable("" + orig(3 * c0, 1) + 'C' + orig(3 * c0 + 1, 1))
    assert(got != null && got.startsWith(s"Ter${c0 + 1}${aa3(newAA)}extTer"), s"got=$got")
  }

  test("events outside the CDS render no protein form") {
    assert(Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "del", "XX", cs - 1, cs + 1) == null)
    assert(Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "ins", "C", ce, ce + 1) == null)
    assert(Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "dup", "C", ce - 1, ce) == null)
    assert(Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "delins", "AC", cs - 1, cs) == null)
  }

  test("length-preserving MNVs reclassify from the clipped peptides") {
    // MNV replacing cds offsets 9-10 (codon 4 only): one residue
    // replaced -> peptide-level SUBSTITUTION p.{Aaa}4{Bbb} (the
    // reference's protein_event_type '>' arm), not delins
    val single = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "delins", "AC", cs + 9, cs + 10)
    val newAA = CodonLogic.codonTable("AC" + orig(11, 1))
    assume(newAA != aaAt(3, 1))
    assert(single == s"${aa3(aaAt(3, 1))}4${aa3(newAA)}", s"got=$single")
    // MNV replacing cds offsets 11-12 spans codons 4 and 5; the new
    // residue 5 equals the old one (both Ter on this derived genome),
    // so clip_protein_alleles trims the shared suffix and the clipped
    // peptides are single residues -> substitution again
    val range = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "delins", "GT", cs + 11, cs + 12)
    val n1 = CodonLogic.codonTable("" + orig(9, 1) + orig(10, 1) + 'G')
    val n2 = CodonLogic.codonTable("T" + orig(13, 1) + orig(14, 1))
    assume(n2 == aaAt(4, 1) && n1 != aaAt(3, 1))
    assert(range == s"${aa3(aaAt(3, 1))}4${aa3(n1)}", s"got=$range")
  }

  test("non-aligned inframe insertion renders the peptide delins form") {
    // 3-base insertion mid-codon ((e+1) % 3 != 0): splits residue 4,
    // producing two new residues -> p.{Aaa}4delins{XxxYyy}
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "ins", "ACG", cs + 9, cs + 10)
    val n1 = CodonLogic.codonTable("" + orig(9, 1) + "AC")
    val n2 = CodonLogic.codonTable("G" + orig(10, 1) + orig(11, 1))
    assume(n1 != aaAt(3, 1) && n2 != aaAt(3, 1))
    assert(got == s"${aa3(aaAt(3, 1))}4delins${aa3(n1)}${aa3(n2)}", s"got=$got")
  }

  test("insertion equal to the preceding residue renders the peptide dup") {
    // codon 3 ('CAA' -> Gln on this derived genome) re-inserted at the
    // following codon boundary: the peptide dup check fires
    val insAA = aaAt(2, 1)
    val codon = (0 to 2).map(j => orig(6 + j, 1)).mkString
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "ins", codon, cs + 8, cs + 9)
    assume(insAA != aaAt(3, 1)) // no peptide 3'-shift interference
    assert(got == s"${aa3(insAA)}3dup", s"got=$got")
  }

  test("spliced CDS: protein coordinates and reads cross exon junctions") {
    // two exons [2000,2059], [2100,2159]; coding cDNA [4, 117]. A
    // 3-base deletion at genomic [2103,2105] sits at cDNA 64..66 =
    // coding offsets 60-62 = codon 20 -> residue 21; the contiguous
    // model has no way to produce 21 (genomic offsets would count the
    // 40-base intron).
    val es = Seq(2000L, 2100L); val ee = Seq(2059L, 2159L)
    val ccs2 = 4L; val cce2 = 117L
    def b(g: Long) = CodonLogic.baseAt(chrom, g)
    val refAA = CodonLogic.codonTable("" + b(2103) + b(2104) + b(2105))
    val nextAA = CodonLogic.codonTable("" + b(2106) + b(2107) + b(2108))
    assume(refAA != nextAA && refAA != "*")
    val got = Hgvsp.proteinForm(chrom, 1, es, ee, ccs2, cce2, "del", "XXX", 2103L, 2105L)
    assert(got == s"${aa3(refAA)}21del", s"got=$got")
    // intronic anchors produce no protein form in the spliced model
    assert(Hgvsp.proteinForm(chrom, 1, es, ee, ccs2, cce2, "del", "XX", 2070L, 2071L) == null)
  }

  test("peptide deletion 3'-shifts across an identical following residue") {
    // residues 23 and 24 are identical on this derived genome; deleting
    // codon 22 (0-based) must shift the rendered deletion to residue 24
    // (Ensembl _check_peptides_post_var / 3' shift)
    assume(aaAt(22, 1) == aaAt(23, 1) && aaAt(22, 1) != aaAt(24, 1))
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1, "del", "X", cs + 66, cs + 68)
    assert(got == s"${aa3(aaAt(22, 1))}24del", s"got=$got")
  }

  // ---- stop-extension + start_lost arms (hgvs.rs:1482-1497,
  // 1895-1960). Expected values computed INDEPENDENTLY by splicing
  // the coding string and translating — not by re-running the
  // operator's arithmetic. ----

  private def codingStr(strand: Int): String =
    (0L until (ce - cs + 1)).map(i => orig(i, strand)).mkString
  private def aaStr(cod: String): String =
    CodonLogic.codonTable.getOrElse(cod, "X")
  private def firstStopFrom(seq: String, fromCodon: Int): Option[Int] =
    (fromCodon until math.min(fromCodon + Hgvsp.maxScanCodons, seq.length / 3))
      .find(c => aaStr(seq.substring(3 * c, 3 * c + 3)) == "*")

  test("inframe deletion of the stop codon renders ?extTer") {
    val coding = codingStr(1)
    // a stop codon with non-stop neighbors (no clip/shift interplay)
    val cOpt = (1 until 250).find { c =>
      aaStr(coding.substring(3 * c, 3 * c + 3)) == "*" &&
        aaStr(coding.substring(3 * (c - 1), 3 * (c - 1) + 3)) != "*" &&
        aaStr(coding.substring(3 * (c + 1), 3 * (c + 1) + 3)) != "*"
    }
    assume(cOpt.nonEmpty)
    val cStop = cOpt.get
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1,
      "del", "XXX", cs + 3 * cStop, cs + 3 * cStop + 2)
    val newCoding = coding.substring(0, 3 * cStop) + coding.substring(3 * cStop + 3)
    val nStr = firstStopFrom(newCoding, cStop)
      .map(c => (c + 1) - (cStop + 1)).filter(_ > 0)
      .map(_.toString).getOrElse("?")
    assert(got == s"Ter${cStop + 1}?extTer$nStr", s"got=$got cStop=$cStop")
  }

  test("MNV replacing the stop codon renders Ter{p}{Bbb}extTer{N}") {
    val coding = codingStr(1)
    val cOpt = (1 until 250).find(c => aaStr(coding.substring(3 * c, 3 * c + 3)) == "*")
    assume(cOpt.nonEmpty)
    val cStop = cOpt.get
    // replace the stop codon with GGG (Gly) via a 3-base delins
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1,
      "delins", "GGG", cs + 3 * cStop, cs + 3 * cStop + 2)
    val newCoding = coding.substring(0, 3 * cStop) + "GGG" + coding.substring(3 * cStop + 3)
    val nStr = firstStopFrom(newCoding, cStop)
      .map(c => (c + 1) - (cStop + 1)).filter(_ > 0)
      .map(_.toString).getOrElse("?")
    assert(got == s"Ter${cStop + 1}Gly" + s"extTer$nStr", s"got=$got cStop=$cStop")
  }

  test("delins consuming the stop appends the extTer extension") {
    val coding = codingStr(1)
    // stop codon whose PRECEDING residue is neither Gly nor a stop:
    // the 6->3 delins [cStop-1, cStop] -> 'GGG' then clips nothing
    val cOpt = (2 until 250).find { c =>
      aaStr(coding.substring(3 * c, 3 * c + 3)) == "*" && {
        val prev = aaStr(coding.substring(3 * (c - 1), 3 * (c - 1) + 3))
        prev != "G" && prev != "*"
      }
    }
    assume(cOpt.nonEmpty)
    val cStop = cOpt.get
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1,
      "delins", "GGG", cs + 3 * (cStop - 1), cs + 3 * cStop + 2)
    val prevAa = aaStr(coding.substring(3 * (cStop - 1), 3 * (cStop - 1) + 3))
    val newCoding = coding.substring(0, 3 * (cStop - 1)) + "GGG" + coding.substring(3 * cStop + 3)
    val ext = firstStopFrom(newCoding, cStop - 1)
      .map(c => (c + 1) - (cStop + 1)).filter(_ > 0)
      .map(n => s"extTer$n").getOrElse("")
    assert(got == s"${aa3(prevAa)}${cStop}_Ter${cStop + 1}delinsGly$ext",
      s"got=$got cStop=$cStop")
  }

  test("a deletion changing the initiator codon renders p.{Aaa}1?") {
    val coding = codingStr(1)
    // 1-base del of the first coding base shifts the initiator codon
    assume(coding.substring(1, 4) != coding.substring(0, 3))
    val got = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1,
      "del", "X", cs, cs)
    assert(got == s"${aa3(aaStr(coding.substring(0, 3)))}1?", s"got=$got")
    // frameshifting insertion inside the initiator codon as well
    val gotIns = Hgvsp.proteinForm(chrom, 1, Seq(cs), Seq(ce), 1L, ce - cs + 1,
      "ins", "T", cs, cs + 1)
    val newC0 = "" + coding.charAt(0) + 'T' + coding.charAt(1)
    assume(newC0 != coding.substring(0, 3))
    assert(gotIns == s"${aa3(aaStr(coding.substring(0, 3)))}1?", s"got=$gotIns")
  }
}
