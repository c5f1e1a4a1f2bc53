package graft.vep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Variation-cache schema-contract validation
  * (bio-function-vep/src/schema_contract.rs:10-90): the required
  * column/type set is checked EAGERLY at the public entry points
  * ([[Vep.lookupVariants]], [[Annotate.annotate]] and friends), so a
  * user pointing at the wrong parquet directory gets the reference's
  * error shape immediately instead of a late Catalyst analysis error
  * deep inside the pipeline.
  *
  * Type compatibility mirrors the reference's `types_compatible`:
  * the string FAMILY is interchangeable (the reference accepts
  * Utf8/Utf8View/LargeUtf8 — DataFusion 50+ reads parquet strings as
  * Utf8View; Spark's analogues are StringType under any collation
  * plus the VARCHAR/CHAR DDL types), while the coordinate columns
  * must be Int64 exactly. Validation is schema-only — no data read,
  * no job launched. */
object SchemaContract {

  /** Required columns of a variation cache table
    * (schema_contract.rs REQUIRED_VARIATION_COLUMNS). */
  val requiredVariationColumns: Seq[(String, DataType)] = Seq(
    "chrom" -> StringType,
    "start" -> LongType,
    "end" -> LongType,
    "variation_name" -> StringType,
    "allele_string" -> StringType)

  /** String-family compatibility (schema_contract.rs
    * `types_compatible`): any StringType (collated or not) and the
    * VARCHAR/CHAR DDL types satisfy a Utf8 requirement. */
  private def compatible(actual: DataType, expected: DataType): Boolean =
    (actual, expected) match {
      case (a, e) if a == e => true
      case (_: StringType | _: VarcharType | _: CharType, _: StringType) => true
      case _ => false
    }

  private def typeName(dt: DataType): String = dt.sql

  /** Validate a variation cache frame against the required contract;
    * throws IllegalArgumentException with the reference's error text
    * on the first violation (missing column, then type mismatch). */
  def validateVariationCache(cache: DataFrame): Unit = {
    val fields = cache.schema.fields.map(f => f.name -> f.dataType).toMap
    for ((name, expected) <- requiredVariationColumns) {
      fields.get(name) match {
        case None =>
          throw new IllegalArgumentException(
            s"Variation cache table is missing required column '$name'. " +
              "Required columns: " +
              requiredVariationColumns.map(_._1).mkString(", "))
        case Some(actual) if !compatible(actual, expected) =>
          throw new IllegalArgumentException(
            s"Variation cache column '$name' has type ${typeName(actual)}, " +
              s"expected ${typeName(expected)}")
        case _ => ()
      }
    }
  }

  /** Validate explicitly-requested output columns against the cache
    * schema (schema_contract.rs `validate_requested_columns`). */
  def validateRequestedColumns(cache: DataFrame, columns: Seq[String]): Unit = {
    val available = cache.schema.fieldNames
    val present = available.toSet
    for (c <- columns if !present.contains(c))
      throw new IllegalArgumentException(
        s"Requested column '$c' not found in cache table. " +
          s"Available columns: ${available.mkString(", ")}")
  }
}
