package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns plus typed metadata, decoded/batched per
  * partition.
  *
  * What's REAL here: image container-header parsing (PNG/GIF/BMP/JPEG
  * magic, dimensions, channels — pure byte logic, no codec library
  * needed), binary column handling, partition-batched `mapPartitions`
  * decode, typed output schemas, expression-level slicing and
  * frame-sampling. Decode is map-side only (no shuffle), binary
  * columns are never a join/agg key, frame explode happens *after*
  * partition pruning.
  *
  * STUB NOTICE: PIXEL decode (rasterize/resample) needs codec
  * libraries this container doesn't ship — `resizeStub` and
  * `audioFeatureStub` are clearly-marked deterministic stand-ins whose
  * schema/batching shape is the production one.
  */
object Multimodal {

  final case class ImageMeta(id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, channels: Int)

  /** Parse a real image container header: format, (width, height),
    * channels. Supported: PNG (IHDR), GIF87a/89a (logical screen),
    * BMP (BITMAPINFOHEADER), JPEG (SOF0/1/2 marker scan). Returns
    * None for unrecognized bytes. Pure JVM byte logic — container
    * metadata needs no codec.
    */
  private[graft] def parseImageHeader(bytes: Array[Byte]): Option[ImageHeader] = {
    if (bytes == null) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (be16(i) << 16) | be16(i + 2)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    val n = bytes.length
    if (n >= 26 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G') {
      val channels = u8(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => 0
      }
      Some(ImageHeader("png", be32(16), be32(20), channels))
    } else if (n >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8') {
      Some(ImageHeader("gif", le16(6), le16(8), 3))
    } else if (n >= 30 && u8(0) == 'B' && u8(1) == 'M') {
      // height may be negative (top-down DIB)
      Some(ImageHeader("bmp", le32(18), math.abs(le32(22)), le16(28) / 8))
    } else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk segment markers to the first start-of-frame
      var i = 2
      while (i + 9 < n) {
        if (u8(i) != 0xff) return Some(ImageHeader("jpeg", 0, 0, 0))
        val m = u8(i + 1)
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // standalone markers
        else if (m == 0xc0 || m == 0xc1 || m == 0xc2)
          return Some(ImageHeader("jpeg", be16(i + 7), be16(i + 5), u8(i + 9)))
        else i += 2 + be16(i + 2)
      }
      Some(ImageHeader("jpeg", 0, 0, 0))
    } else None
  }

  final case class ImageHeader(format: String, width: Int, height: Int, channels: Int)

  /** One sampled "video frame": a byte range of the blob. */
  final case class Frame(id: Long, frame_idx: Long, offset: Long, n_bytes: Long)

  /** Attach a binary payload column (here: utf8 bytes of a text column
    * stand in for real media bytes; at scale this is the parquet
    * binary column itself).
    */
  def asBinary(df: DataFrame, id: String, payload: String): DataFrame =
    df.select(col(id).cast("long").as("id"), col(payload).cast("binary").as("data"))

  /** Partition-batched decode → typed metadata. REAL container-header
    * parsing (see [[parseImageHeader]]); bytes that are no known image
    * container come back as format "unknown" with zero dimensions —
    * the filter a curation pipeline uses to drop undecodable blobs.
    */
  def decodeImageMeta(df: DataFrame): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("data")).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val n = if (bytes == null) 0 else bytes.length
        parseImageHeader(bytes) match {
          case Some(h) => ImageMeta(id, n.toLong, h.format, h.width, h.height, h.channels)
          case None    => ImageMeta(id, n.toLong, "unknown", 0, 0, 0)
        }
      }
    }
  }

  /** Expression-level byte-range "resize" (crop-to-bytes).
    * STUB for a codec resize; shape is real: binary in → binary out,
    * pure map-side, stays in whole-stage codegen.
    */
  def resizeStub(df: DataFrame, maxBytes: Int): DataFrame =
    df.withColumn("data", substring(col("data"), 1, maxBytes))

  /** Frame sampling: treat the blob as fixed-size frames, keep every
    * `everyN`-th. Pure expressions (sequence + explode + substring),
    * so sampling composes with partition pruning and predicate
    * pushdown before any bytes move.
    */
  def frameSample(df: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    val nFrames = floor(octet_length(col("data")) / frameBytes)
    df.withColumn("frame_idx",
        explode(when(nFrames > 0,
          sequence(lit(0L), nFrames.cast("long") - 1L, lit(everyN.toLong)))
          .otherwise(array().cast("array<long>"))))
      .select(col("id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("offset"),
        substring_index_bytes(frameBytes))
  }

  private def substring_index_bytes(frameBytes: Int) =
    substring(col("data"), (col("frame_idx") * frameBytes + 1).cast("int"), lit(frameBytes)).as("frame")

  /** Partition-batched "audio feature" extraction.
    * STUB: per-window byte mean/std stand in for MFCC frames; the
    * batching and array<double> feature schema are real.
    */
  def audioFeatureStub(df: DataFrame, window: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("data")).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val feats = b.grouped(window).map { w =>
          val m = w.map(_ & 0xff).sum.toDouble / w.length
          val v = w.map(x => { val d = (x & 0xff) - m; d * d }).sum / w.length
          math.sqrt(v)
        }.toArray
        (id, feats)
      }
    }.toDF("id", "features")
  }
}
