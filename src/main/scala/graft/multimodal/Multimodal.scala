package graft.multimodal

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode/feature steps
  * run per-partition over batches.
  *
  * Image and audio decode are REAL, zero-dependency JDK codecs
  * ([[JdkCodec]]): ImageIO header readers (PNG/JPEG/GIF/BMP/TIFF/WBMP
  * ship with the JDK, headless-safe — dimensions come from the format
  * header without decoding pixels) and javax.sound WAV/AIFF/AU
  * parsing for duration. Video is the one genuinely codec-less format
  * in the JDK, so it parses the synthetic 16-byte header
  * ([[FakeCodec]]), which also serves as the fallback for
  * unrecognized image/audio payloads — swapping in a full decoder
  * (JavaCV etc.) replaces only that body.
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

  /** Synthetic-header parser — the VIDEO stand-in (the JDK ships no
    * video codec) and the fallback for unrecognized image/audio
    * payloads. Header layout (big-endian): bytes 0-3 width, 4-7
    * height, 8-15 duration_ms. */
  object FakeCodec {
    def decodeHeader(bytes: Array[Byte]): (Int, Int, Long) = {
      def be32(o: Int): Int =
        ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      if (bytes.length < 16) (0, 0, 0L)
      else (be32(0), be32(4), (be32(8).toLong << 32) | (be32(12).toLong & 0xffffffffL))
    }
  }

  /** Real JDK decoders — no dependencies beyond the platform. */
  object JdkCodec {
    // ImageIO registry scans are headless-safe; assert it anyway so an
    // executor JVM launched with a display never tries to use it.
    // setUseCache(false): the default ImageInputStream is backed by a
    // TEMP FILE ON DISK — one create+delete per decoded payload, which
    // alone put mm_features at ~16 s for 100K rows at bench scale;
    // the in-memory cache stream needs no filesystem at all.
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)

    /** Magic-byte prefilter for the JDK's built-in image readers
      * (PNG, JPEG, GIF, BMP, TIFF, WBMP-excluded — WBMP has no magic,
      * headerless): probing the full ImageIO reader registry per row
      * costs registry iteration + stream setup, so rows that cannot
      * possibly be images (the common case in a mixed asset table)
      * skip it entirely on a byte compare. */
    private def looksLikeImage(b: Array[Byte]): Boolean =
      b.length >= 4 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||               // JPEG
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||                // GIF
        (b(0) == 'B' && b(1) == 'M') ||                               // BMP
        (b(0) == 'I' && b(1) == 'I' && b(2) == 42) ||                 // TIFF LE
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))      // TIFF BE

    /** RIFF/WAVE, AIFF (FORM), AU (.snd) container magics. */
    private def looksLikeAudio(b: Array[Byte]): Boolean =
      b.length >= 12 && (
        (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
        (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||
        (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

    /** (width, height) from any ImageIO-registered format's header
      * (JDK built-ins: PNG, JPEG, GIF, BMP, TIFF). Reads ONLY the
      * header — `ImageReader.getWidth(0)` never decodes pixel data,
      * so cost is O(header), not O(pixels). None when the magic bytes
      * match no built-in format or no registered reader recognizes
      * the bytes. */
    def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (!looksLikeImage(bytes)) return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getWidth(0), r.getHeight(0)))
          } finally r.dispose()
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally iis.close()
    }

    /** Duration in ms from a javax.sound-recognized audio payload
      * (JDK built-ins: WAV, AIFF, AU). None when the container magic
      * matches none of them or the header lacks a frame count. */
    def audioDurationMs(bytes: Array[Byte]): Option[Long] = {
      if (!looksLikeAudio(bytes)) return None
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val rate = ais.getFormat.getFrameRate
          val frames = ais.getFrameLength
          if (rate > 0 && frames >= 0) Some(math.round(frames * 1000.0 / rate))
          else None
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Deterministic PNG fixture encoder (gate/test payloads): a real
      * w×h PNG whose pixels derive from coordinates. */
    def encodePng(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Deterministic WAV fixture encoder: `frames` 8-bit mono frames
      * at 1000 Hz, so duration_ms == frames exactly. */
    def encodeWav(frames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(1000f, 8, 1, true, false)
      val data = Array.tabulate[Byte](frames)(i => (i * 17).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
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
        // real JDK decode first (ImageIO header read / javax.sound);
        // the synthetic-header parse is the video path and the
        // fallback for unrecognized payloads
        val (w, h, dur) = mt match {
          case "image" =>
            JdkCodec.imageDims(payload) match {
              case Some((iw, ih)) => (iw, ih, 0L)
              case None => FakeCodec.decodeHeader(payload)
            }
          case "audio" =>
            JdkCodec.audioDurationMs(payload) match {
              case Some(d) => (0, 0, d)
              case None => FakeCodec.decodeHeader(payload)
            }
          case _ => FakeCodec.decodeHeader(payload)
        }
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
