package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns plus typed metadata, decoded/batched per
  * partition.
  *
  * STUB NOTICE: no codec libraries exist in this container, so the
  * decode bodies are clearly-marked deterministic fakes derived from
  * the raw bytes. Everything around them — binary column handling,
  * partition-batched `mapPartitions` decode, typed output schema,
  * expression-level slicing/frame-sampling — is the real 100 TB
  * plumbing: decode is map-side only (no shuffle), binary columns are
  * never part of a join/agg key, and frame explode happens *after*
  * partition pruning.
  */
object Multimodal {

  /** Fake "image" metadata — in production this calls the codec. */
  final case class ImageMeta(id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, channels: Int)

  /** One sampled "video frame": a byte range of the blob. */
  final case class Frame(id: Long, frame_idx: Long, offset: Long, n_bytes: Long)

  /** Attach a binary payload column (here: utf8 bytes of a text column
    * stand in for real media bytes; at scale this is the parquet
    * binary column itself).
    */
  def asBinary(df: DataFrame, id: String, payload: String): DataFrame =
    df.select(col(id).cast("long").as("id"), col(payload).cast("binary").as("data"))

  /** Partition-batched decode → typed metadata.
    * STUB: format/width/height are deterministic functions of the
    * bytes; a real implementation swaps only the closure body.
    */
  def decodeImageMeta(df: DataFrame): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("data")).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val n = if (bytes == null) 0 else bytes.length
        val fmt = (n % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" }
        val w = 16 + (if (n > 0) bytes(0) & 0x7f else 0)
        val h = 16 + (if (n > 1) bytes(1) & 0x7f else 0)
        ImageMeta(id, n.toLong, fmt, w, h, 3)
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
