package graft.multimodal

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode/feature steps
  * run per-partition over batches.
  *
  * The actual codec step is STUBBED (this container ships no
  * image/audio libraries): [[FakeCodec]] is a deterministic
  * stand-in that parses our synthetic 16-byte header. Everything
  * around it — schema contract, binary column handling, partition
  * batching, feature schema — is real and tested, so swapping in a
  * real decoder (JavaCV, TwelveMonkeys, javax.sound) only replaces
  * the codec body.
  */
object Multimodal {

  /** Feature row produced per asset. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_length", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("checksum", StringType, nullable = false)))

  /** STUB decoder — deterministic fake. Synthetic header layout
    * (big-endian): bytes 0-3 width, 4-7 height, 8-15 duration_ms.
    * A real implementation would replace only this object. */
  object FakeCodec {
    def decodeHeader(bytes: Array[Byte]): (Int, Int, Long) = {
      def be32(o: Int): Int =
        ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      if (bytes.length < 16) (0, 0, 0L)
      else (be32(0), be32(4), (be32(8).toLong << 32) | (be32(12).toLong & 0xffffffffL))
    }
  }

  /** Decode + feature-extract over a binary asset table
    * `(asset_id Long, media_type String, payload Binary)`.
    * Runs as one mapPartitions pass — per-partition batches, no
    * shuffle; the shape a Pandas-UDF/`mapInPandas` pipeline has in
    * PySpark. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds = graft.core.Parallelism.ensure(assets)
      .select(col("asset_id").cast("long"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, mt, payload) =>
        val (w, h, dur) = FakeCodec.decodeHeader(payload)
        md.reset()
        val sum = md.digest(payload).map("%02x".format(_)).mkString
        (id, mt, payload.length.toLong,
          if (mt == "image" || mt == "video") Some(w) else None,
          if (mt == "image" || mt == "video") Some(h) else None,
          if (mt == "audio" || mt == "video") Some(dur) else None,
          sum)
      }
    }.toDF("asset_id", "media_type", "byte_length", "width", "height", "duration_ms", "checksum")
  }

  /** Frame sampling: `n` deterministic evenly spaced offsets in
    * [0, duration) per asset — `offset_ms = floor(duration * i / n)`,
    * the timestamps a real variant would decode frames at. Map-only
    * explode (one output row per (asset, frame index)), no shuffle —
    * at 100 TB the row expansion happens inside the scan stage. */
  def sampleFrameOffsets(features: DataFrame, n: Int): DataFrame =
    features.where(col("duration_ms").isNotNull && col("duration_ms") > 0)
      .select(col("asset_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => floor(col("duration_ms") * i / n).cast("long")))
          .as(Seq("frame_idx", "offset_ms")))

  /** Resize planning: aspect-preserving target dimensions with the
    * long edge clamped to `maxDim` (floor semantics, never upscale).
    * Pure column arithmetic over the feature table — the real decode+
    * rescale kernel would consume (asset_id, new_width, new_height)
    * per partition; the plan itself is map-only and codegen'd. */
  def resizePlan(features: DataFrame, maxDim: Int): DataFrame = {
    // integer DIV keeps both engines on exact floor semantics (a
    // double division + floor can land one off when the true quotient
    // sits just below an integer)
    def side(c: String): String =
      s"CAST(CASE WHEN greatest(_w, _h) > $maxDim " +
      s"THEN ($c * $maxDim) DIV greatest(_w, _h) ELSE $c END AS INT)"
    features
      .where(col("width").isNotNull && col("height").isNotNull &&
        col("width") > 0 && col("height") > 0)
      .select(col("asset_id"), col("width").cast("long").as("_w"),
        col("height").cast("long").as("_h"))
      .selectExpr("asset_id", "CAST(_w AS INT) AS width", "CAST(_h AS INT) AS height",
        s"${side("_w")} AS new_width", s"${side("_h")} AS new_height")
  }
}
