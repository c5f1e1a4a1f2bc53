package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** Coordinate-system metadata (SURVEY §1 / §2 table: the reference
  * tags table schemas with `bio.coordinate_system_zero_based` and its
  * VEP lookup converts between systems automatically —
  * bio-function-vep/src/coordinate.rs:18,34-66). Spark drops
  * SCHEMA-level metadata through most operators, so the tag lives on
  * the `start` FIELD's metadata (the survey's "more robust" plan),
  * which survives pass-through projections.
  *
  * Conversion contract: 1-based closed `[s, e]` ≡ 0-based half-open
  * `[s-1, e)` — aligning a frame into the other system shifts `start`
  * by one and leaves `end` unchanged. */
object Coord {
  /** The reference's Arrow schema metadata key (coordinate.rs:18). */
  val MetadataKey = "bio.coordinate_system_zero_based"

  /** Tag `df`'s `start` field with its coordinate system. */
  def mark(df: DataFrame, zeroBased: Boolean): DataFrame =
    mark(df, zeroBased, "start")

  /** Tag an arbitrary start-like field (`pos_start`, `pos`) — the
    * reference stamps the SCHEMA of every provider output
    * (pileup/src/schema.rs:28-60); field-level is the Spark-durable
    * equivalent (schema-level metadata dies at the first projection). */
  def mark(df: DataFrame, zeroBased: Boolean, startField: String): DataFrame = {
    val m = new MetadataBuilder().putString(MetadataKey, zeroBased.toString).build()
    df.withColumn(startField, col(startField).as(startField, m))
  }

  /** Read the tag; untagged frames default to 1-based, exactly like
    * the reference's `is_zero_based` (absent metadata → false). */
  def isZeroBased(df: DataFrame): Boolean = isZeroBased(df, "start")

  def isZeroBased(df: DataFrame, startField: String): Boolean =
    df.schema.fields.find(_.name == startField).exists(f =>
      f.metadata.contains(MetadataKey) &&
        f.metadata.getString(MetadataKey) == "true")

  /** `df`'s `start` as a 1-BASED coordinate: 0-based half-open
    * `[s, e)` ≡ 1-based closed `[s+1, e]`, so a zero-based tag shifts
    * start up one and `end` never shifts. Aligning both sides of a
    * lookup through this is the reference's "0-based -> 1-based
    * normalization" (lookup_provider.rs metadata tests). */
  def oneBasedStart(df: DataFrame): Column = {
    val s = col("start").cast("long")
    if (isZeroBased(df)) s + 1L else s
  }
}
