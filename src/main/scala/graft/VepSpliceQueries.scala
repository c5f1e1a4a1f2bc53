package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.vep.Splice

/** Driver-gate entries for the intron-aware cDNA/HGVS layer
  * ([[graft.vep.Splice]], SURVEY.md §2.6 stage 5). The oracle mirrors
  * every branch of the Spark expressions in DuckDB SQL over the same
  * derived fixtures ([[Oracle]]).
  */
object VepSpliceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f11_cdna_hgvs" -> ((s, d) =>
      Splice.cdnaAnnotate(Tables.vcf(s, d), Tables.transcripts(s, d), Tables.exons(s, d))),
  )

  /** Per-exon cDNA contribution of position `pos` (Splice.contribution
    * mirrored; `e` = exon alias, `strand` in scope). */
  private def contrib(pos: String): String =
    s"""CASE WHEN strand = 1 THEN
       |  CASE WHEN e."end" < $pos THEN e."end" - e.start + 1
       |       WHEN $pos BETWEEN e.start AND e."end" THEN $pos - e.start + 1
       |       ELSE 0 END
       | ELSE
       |  CASE WHEN e.start > $pos THEN e."end" - e.start + 1
       |       WHEN $pos BETWEEN e.start AND e."end" THEN e."end" - $pos + 1
       |       ELSE 0 END END""".stripMargin.replace("\n", " ")

  private val cdnaHgvsSql: String = {
    import Oracle.{vcf => vcfCte, transcripts => tCte, exons => exCte}
    val anchor1 = "(CASE WHEN strand = 1 THEN cds_start ELSE cds_end END)"
    val anchor2 = "(CASE WHEN strand = 1 THEN cds_end ELSE cds_start END)"
    // cds-relative rendering of a cDNA index x (fmtC in Splice)
    def fmtC(x: String): String =
      s"""CASE WHEN biotype <> 'protein_coding' THEN CAST($x AS VARCHAR)
         | WHEN $x < ccs THEN concat('-', CAST(ccs - $x AS VARCHAR))
         | WHEN $x > cce THEN concat('*', CAST($x - cce AS VARCHAR))
         | ELSE CAST($x - ccs + 1 AS VARCHAR) END""".stripMargin.replace("\n", " ")
    s"""WITH $vcfCte, $tCte, $exCte,
       |snv AS (SELECT * FROM v WHERE length(ref) = 1 AND length(alt) = 1),
       |cand AS (SELECT s.id, s.start AS vp, s.ref, s.alt,
       |   t.transcript_id AS tid, t.strand, t.biotype
       |  FROM snv s JOIN t ON s.chrom = t.chrom AND s.start BETWEEN t.start AND t."end"),
       |agg AS (SELECT c.id, c.tid, c.strand, c.biotype, c.ref, c.alt, c.vp,
       |   MAX(CASE WHEN c.vp BETWEEN e.start AND e."end" THEN 1 ELSE 0 END) AS in_exon,
       |   CAST(SUM(${contrib("c.vp")}) AS BIGINT) AS cdna,
       |   MAX(CASE WHEN e."end" < c.vp THEN e."end" END) AS prev_ee,
       |   MIN(CASE WHEN e.start > c.vp THEN e.start END) AS next_es
       |  FROM cand c JOIN ex e ON c.tid = e.transcript_id
       |  GROUP BY c.id, c.tid, c.strand, c.biotype, c.ref, c.alt, c.vp),
       |cb AS (SELECT t.transcript_id AS tid,
       |   CAST(SUM(${contrib(anchor1)})
       |     + (CASE WHEN MAX(CASE WHEN $anchor1 BETWEEN e.start AND e."end" THEN 1 ELSE 0 END) = 0
       |        THEN 1 ELSE 0 END) AS BIGINT) AS ccs,
       |   CAST(SUM(${contrib(anchor2)}) AS BIGINT) AS cce
       |  FROM t JOIN ex e ON t.transcript_id = e.transcript_id
       |  GROUP BY t.transcript_id),
       |x AS (SELECT agg.*, cb.ccs, cb.cce,
       |   CASE WHEN strand = 1 THEN vp - prev_ee ELSE next_es - vp END AS dplus,
       |   CASE WHEN strand = 1 THEN next_es - vp ELSE vp - prev_ee END AS dminus,
       |   CASE WHEN strand = 1 THEN ref ELSE translate(ref, 'ACGT', 'TGCA') END AS refadj,
       |   CASE WHEN strand = 1 THEN alt ELSE translate(alt, 'ACGT', 'TGCA') END AS altadj,
       |   (in_exon = 1 AND biotype = 'protein_coding'
       |     AND cdna >= cb.ccs AND cdna <= cb.cce) AS incds
       |  FROM agg JOIN cb ON agg.tid = cb.tid),
       |y AS (SELECT x.*,
       |   concat(tid, ':', CASE WHEN biotype = 'protein_coding' THEN 'c.' ELSE 'n.' END) AS pfx,
       |   concat(refadj, '>', altadj) AS chg,
       |   (next_es IS NULL OR (prev_ee IS NOT NULL AND dplus <= dminus)) AS useplus,
       |   CASE WHEN incds THEN cdna - ccs + 1 END AS cds_pos
       |  FROM x)
       |SELECT id, tid AS transcript_id,
       | CASE WHEN in_exon = 1 THEN 'exonic' ELSE 'intronic' END AS region,
       | CASE WHEN in_exon = 1 THEN cdna END AS cdna_pos,
       | cds_pos,
       | CASE WHEN incds THEN CAST((cds_pos - 1) // 3 + 1 AS BIGINT) END AS protein_pos,
       | CASE WHEN in_exon = 1 THEN concat(pfx, ${fmtC("cdna")}, chg)
       |  WHEN useplus THEN concat(pfx, ${fmtC("cdna")}, '+', CAST(dplus AS VARCHAR), chg)
       |  ELSE concat(pfx, ${fmtC("(cdna + 1)")}, '-', CAST(dminus AS VARCHAR), chg)
       | END AS hgvs_c
       |FROM y ORDER BY id, transcript_id""".stripMargin.replace("\n", " ")
  }

  val oracleSql: Map[String, String] = Map(
    "f11_cdna_hgvs" -> cdnaHgvsSql,
  )
}
