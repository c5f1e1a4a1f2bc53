package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup for document pipelines: keep the first
  * occurrence of each key as data arrives. Structured Streaming's
  * dropDuplicates keys a state store entry per distinct key — at
  * real scale the keys must be fixed-width digests (not raw text) and,
  * for unbounded streams, bounded by a watermark TTL so state ages
  * out; both variants below enforce that shape. */
object StreamDedup {

  /** First occurrence per content digest: rows whose md5(textCol) has
    * not been seen before. State = one 32-char digest per distinct
    * document — NOT the document text — so state size is O(distinct
    * docs), independent of document length. Unbounded state: use
    * [[firstOccurrencesWithinWatermark]] for continuous sources. */
  def firstOccurrences(stream: DataFrame, textCol: String): DataFrame =
    stream.withColumn("fp", md5(col(textCol))).dropDuplicates("fp")

  /** Watermarked variant: duplicates are only suppressed within the
    * event-time watermark delay, and state older than the watermark is
    * dropped — the bounded-state contract for 24/7 ingestion
    * (dropDuplicatesWithinWatermark semantics). */
  def firstOccurrencesWithinWatermark(
      stream: DataFrame, textCol: String,
      eventTimeCol: String, delay: String): DataFrame =
    stream.withColumn("fp", md5(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fp")
}
