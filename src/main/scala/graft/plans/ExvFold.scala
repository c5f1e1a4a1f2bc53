package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Configuration for [[ExvFold]] — plain serializable values so the
  * expression canonicalizes and ships to executors.
  *
  * @param groupOn      per AF column (afCsq order): is its flag group
  *                     enabled (renders its CSQ slot + variant value)
  * @param popNames     MAX_AF population names, maxAfPopCols order
  * @param popFieldIdx  ent-struct field index of each pop's AF column
  * @param maxAfOn      MAX_AF/MAX_AF_POPS gate
  * @param pubmedOn     PUBMED gate */
final case class ExvConf(
    groupOn: Seq[Boolean], popNames: Seq[String], popFieldIdx: Seq[Int],
    maxAfOn: Boolean, pubmedOn: Boolean)

/** The colocated-variant (Existing_variation) per-variant fold as ONE
  * compiled expression — the reference's FrequencyFields + clinical
  * assembly (annotate_provider.rs:1507-1860) over the sorted `_ents`
  * struct array.
  *
  * Replaces the former two-layer chain of ~30 higher-order-function
  * expressions (transform/filter/flatten/exists/array_distinct per AF
  * column and per clinical field): Spark HOFs are CodegenFallback, so
  * every lambda evaluated interpreted per array element in the
  * per-matched-variant aggregate, and the expanded chain carried
  * ~1,900 expression nodes of plan mass per annotate call (round-11
  * verdict #2 — the exv family was the largest residual after the
  * union filters). Semantics are byte-identical to the SQL
  * formulation, which the DuckDB oracle keeps (exvCtes in
  * VepSpliceQueries), so the engines cross-check each other.
  *
  * Ent struct layout (Annotate.lookedEntStruct): sm(0) pr(1) vn(2)
  * af×27(3..29) somatic(30) pheno(31) pubmed(32) cs(33) csa(34).
  *
  * Output: struct<exvar string, exsuffix string, afs array<double>,
  * max_af double, max_af_pops string>; NULL when `_ents` is empty
  * (the LEFT-join-miss shape — every consumer column reads null). */
case class ExvFold(ents: Expression, va: Expression, conf: ExvConf)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = ents
  override def right: Expression = va
  override def nullable: Boolean = true

  private val numAf = conf.groupOn.size
  private val SomaticIdx = 3 + numAf
  private val PhenoIdx = 4 + numAf
  private val PubmedIdx = 5 + numAf
  private val CsIdx = 6 + numAf
  private val CsaIdx = 7 + numAf
  private val NumFields = 8 + numAf

  override def dataType: DataType = StructType(Seq(
    StructField("exvar", StringType),
    StructField("exsuffix", StringType),
    StructField("afs", ArrayType(DoubleType, containsNull = true)),
    StructField("max_af", DoubleType),
    StructField("max_af_pops", StringType)))

  /** CAST(double AS DECIMAL(5,4)) — Spark's cast machinery, so the
    * rounding and rendered string agree with the SQL formulation. */
  private def dec54(v: Double): Decimal = {
    val d = Decimal(v)
    if (d.changePrecision(5, 4)) d else null
  }

  /** csq_escape (annotate_provider.rs:1931-1961): lone '-' empties;
    * ','/'|' -> '&', ';' -> '%3B', \s -> '_' — the string twin of
    * Annotate.csqEscape's Column form. */
  private def esc(s: String): String =
    if (s == "-") ""
    else s.replace(",", "&").replace("|", "&").replace(";", "%3B")
      .replaceAll("\\s", "_")

  override def eval(input: InternalRow): Any = {
    val entsData = ents.eval(input).asInstanceOf[ArrayData]
    if (entsData == null || entsData.numElements() == 0) return null
    val n = entsData.numElements()
    val vaVal = va.eval(input) match {
      case null => null
      case u: UTF8String => u.toString
    }
    val rows = new Array[InternalRow](n)
    var i = 0
    while (i < n) { rows(i) = entsData.getStruct(i, NumFields); i += 1 }

    // _exm: max over all entries of the DECIMAL(5,4)-cast pop columns
    var exm: Decimal = null
    for (r <- rows; j <- conf.popFieldIdx.indices) {
      val f = conf.popFieldIdx(j)
      if (!r.isNullAt(f)) {
        val d = dec54(r.getDouble(f))
        if (d != null && (exm == null || d.compare(exm) > 0)) exm = d
      }
    }
    // _afl_c: per-column distinct decimal strings, entry order
    val afl = Array.fill(numAf)(new java.util.LinkedHashSet[String]())
    for (r <- rows) {
      var c = 0
      while (c < numAf) {
        if (!r.isNullAt(3 + c)) {
          val d = dec54(r.getDouble(3 + c))
          if (d != null) afl(c).add(d.toString)
        }
        c += 1
      }
    }
    // _pops: entry-major, per entry every pop column attaining _exm
    val pops = collection.mutable.ArrayBuffer[String]()
    if (exm != null) for (r <- rows; j <- conf.popFieldIdx.indices) {
      val f = conf.popFieldIdx(j)
      if (!r.isNullAt(f)) {
        val d = dec54(r.getDouble(f))
        if (d != null && d.compare(exm) == 0) pops += conf.popNames(j)
      }
    }
    // clin_sig_allele values for the variant's output allele; the
    // fallback clin_sig scope stops BEFORE the first csa-bearing entry
    val csaVals = new java.util.LinkedHashSet[String]()
    var csaPos = 0 // 1-based; 0 = none
    for ((r, idx) <- rows.zipWithIndex) {
      if (!r.isNullAt(CsaIdx)) {
        if (csaPos == 0) csaPos = idx + 1
        if (vaVal != null) {
          val chunks = r.getUTF8String(CsaIdx).toString.split(";", -1)
          val matching = chunks.filter { ch =>
            val k = ch.indexOf(':')
            k >= 0 && ch.substring(0, k) == vaVal
          }
          if (matching.nonEmpty)
            csaVals.add(matching.map(ch => ch.substring(ch.indexOf(':') + 1))
              .mkString(","))
        }
      }
    }
    val fbScope = if (csaPos == 0) n else csaPos - 1
    val fbVals = collection.mutable.ArrayBuffer[String]()
    var k = 0
    while (k < fbScope) {
      val r = rows(k)
      if (!r.isNullAt(CsIdx))
        fbVals ++= r.getUTF8String(CsIdx).toString.split(",", -1).filter(_ != "")
      k += 1
    }
    val pbVals = collection.mutable.ArrayBuffer[String]()
    for (r <- rows)
      if (!r.isNullAt(PubmedIdx))
        pbVals ++= r.getUTF8String(PubmedIdx).toString.split(",", -1)
          .filter(_ != "")

    def flagStr(r: InternalRow, f: Int): String =
      if (!r.isNullAt(f) && r.getUTF8String(f).toString == "1") "1" else "0"
    def gatedFlags(f: Int): String =
      if (rows.exists(r => flagStr(r, f) == "1"))
        rows.map(flagStr(_, f)).mkString("&")
      else ""

    import scala.jdk.CollectionConverters._
    val clinField =
      if (!csaVals.isEmpty) esc(csaVals.asScala.mkString(";"))
      else if (fbVals.nonEmpty) esc(fbVals.mkString("&"))
      else ""
    val pubField = if (pbVals.nonEmpty) esc(pbVals.mkString("&")) else ""
    val exvar = rows.iterator.map(r =>
        if (r.isNullAt(2)) null else r.getUTF8String(2).toString)
      .filter(v => v != null && v != "").mkString("&")

    val parts: Seq[String] =
      conf.groupOn.zipWithIndex.map { case (on, c) =>
        if (on) afl(c).asScala.mkString("&") else ""
      } ++ Seq(
        if (conf.maxAfOn && exm != null) exm.toString else "",
        if (conf.maxAfOn) pops.mkString("&") else "",
        clinField, gatedFlags(SomaticIdx), gatedFlags(PhenoIdx),
        if (conf.pubmedOn) pubField else "")
    val suffix = parts.mkString("|")

    val afs = new Array[Any](numAf)
    var c = 0
    while (c < numAf) {
      afs(c) =
        if (conf.groupOn(c) && afl(c).size == 1)
          java.lang.Double.parseDouble(afl(c).iterator.next())
        else null
      c += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(exvar),
      UTF8String.fromString(suffix),
      new GenericArrayData(afs),
      if (conf.maxAfOn && exm != null) exm.toDouble else null,
      if (conf.maxAfOn && pops.nonEmpty) UTF8String.fromString(pops.mkString("&"))
      else null))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExvFold =
    copy(ents = newLeft, va = newRight)
}
