package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns plus typed metadata, decoded/batched per
  * partition.
  *
  * Everything here is REAL and runs on a bare JDK — no external codec
  * dependency: container-header parsing is pure byte logic; pixel
  * decode → resample → re-encode uses the JDK's own `javax.imageio`
  * (PNG/GIF/BMP/JPEG readers ship with every JDK, headless-safe);
  * audio decode uses `javax.sound.sampled` (WAV/AU/AIFF PCM parsing,
  * also JDK-built-in). Decode is map-side only (no shuffle), binary
  * columns are never a join/agg key, frame explode happens *after*
  * partition pruning, and undecodable blobs are dropped — the filter
  * shape a curation pipeline wants for malformed media at scale.
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

  final case class ResizedImage(id: Long, src_format: String, src_width: Int,
      src_height: Int, width: Int, height: Int, png: Array[Byte])

  /** REAL pixel decode → bilinear resample → PNG re-encode, via the
    * JDK-built-in `javax.imageio` readers (PNG/GIF/BMP/JPEG). Headless:
    * BufferedImage rasters never touch a display. Partition-batched,
    * map-side only; blobs imageio cannot decode are dropped. Output
    * carries the source format/dims plus the resized PNG bytes —
    * the thumbnail/normalize stage of a multimodal training pipeline.
    */
  def resizeImages(df: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("data")).as[(Long, Array[Byte])].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory, no executor temp files
      it.flatMap { case (id, bytes) =>
        decodeResizeOne(bytes, targetW, targetH).map { case (fmt, w, h, png) =>
          ResizedImage(id, fmt, w, h, targetW, targetH, png)
        }
      }
    }
  }

  private[graft] def decodeResizeOne(bytes: Array[Byte], tw: Int,
      th: Int): Option[(String, Int, Int, Array[Byte])] =
    parseImageHeader(bytes).flatMap { hdr =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(tw, th,
            java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, tw, th, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some((hdr.format, img.getWidth, img.getHeight, bos.toByteArray))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  final case class ColorProfile(id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double,
      top_bucket: Int, top_share: Double)

  /** REAL pixel-level dominant-color profile: decode via javax.imageio,
    * quantize each pixel to a 64-cell RGB cube (2 bits/channel), and
    * report the modal cell's share plus the exact mean channel values
    * — the cheap visual-content fingerprint a multimodal curation
    * pipeline uses for near-solid/flat-image filtering and
    * palette-based stratification. Map-side only (mapPartitions, no
    * shuffle); undecodable blobs drop, like [[resizeImages]].
    */
  def dominantColors(df: DataFrame): Dataset[ColorProfile] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("data")).as[(Long, Array[Byte])].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { case (id, bytes) => dominantColorsOne(id, bytes) }
    }
  }

  private[graft] def dominantColorsOne(id: Long,
      bytes: Array[Byte]): Option[ColorProfile] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val buckets = new Array[Long](64)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sr += r; sg += g; sb += b
            buckets(((r >> 6) << 4) | ((g >> 6) << 2) | (b >> 6)) += 1L
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var best = 0
        var i = 1
        while (i < 64) { if (buckets(i) > buckets(best)) best = i; i += 1 }
        Some(ColorProfile(id, w, h, sr.toDouble / n, sg.toDouble / n,
          sb.toDouble / n, best, buckets(best).toDouble / n))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

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

  final case class AudioFeatures(id: Long, sample_rate: Double, n_channels: Int,
      n_samples: Long, rms: Array[Double])

  /** Perceptual average-hash (aHash): decode → 8×8 grayscale
    * downsample → threshold each cell against the mean → 64-bit
    * fingerprint. Visually-identical images hash equal regardless of
    * container format; small edits flip few bits — so image near-dup
    * detection becomes the SAME banded Hamming problem text SimHash
    * already solves, and [[imageNearDupPairs]] reuses that machinery
    * verbatim. Map-side only; undecodable blobs drop.
    */
  def aHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("data")).as[(Long, Array[Byte])].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { case (id, bytes) => aHashOne(bytes).map(h => (id, h)) }
    }.toDF("id", "ahash")
  }

  private[graft] def aHashOne(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val gray = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = gray.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, 8, 8, null)
        g.dispose()
        val px = new Array[Int](64)
        var i = 0
        while (i < 64) { px(i) = gray.getRaster.getSample(i % 8, i / 8, 0); i += 1 }
        val mean = px.sum.toDouble / 64.0
        var h = 0L
        i = 0
        while (i < 64) { if (px(i) >= mean) h |= (1L << i); i += 1 }
        Some(h)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** DCT perceptual hash (pHash): decode → 32×32 grayscale → 2-D DCT →
    * the 8×8 low-frequency block (DC term dropped) thresholded at its
    * median — robust to brightness/contrast shifts and mild blur where
    * [[aHash]]'s plain mean-threshold is not (a gamma shift moves every
    * pixel AND the mean together in aHash, but reorders DCT
    * coefficients much less). Same map-side shape: one Long per image,
    * no shuffle; compose with [[imageNearDupPairs]]' banded Hamming
    * join for candidates.
    */
  def pHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("data")).as[(Long, Array[Byte])].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { case (id, bytes) => pHashOne(bytes).map(h => (id, h)) }
    }.toDF("id", "phash")
  }

  private[graft] def pHashOne(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val n = 32
        val gray = new java.awt.image.BufferedImage(n, n,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = gray.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, n, n, null)
        g.dispose()
        val px = Array.tabulate(n, n)((y, x) =>
          gray.getRaster.getSample(x, y, 0).toDouble)
        // separable 2-D DCT-II, only the 8×8 low-frequency corner needed
        val cos = Array.tabulate(8, n)((u, i) =>
          math.cos((2 * i + 1) * u * math.Pi / (2.0 * n)))
        val coef = Array.tabulate(8, 8) { (u, v) =>
          var s = 0.0
          var y = 0
          while (y < n) {
            var x = 0
            while (x < n) { s += px(y)(x) * cos(u)(y) * cos(v)(x); x += 1 }
            y += 1
          }
          s
        }
        val ac = (for { u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0 }
          yield coef(u)(v)).toArray
        val med = { val s = ac.sorted; (s(31) + s(32)) / 2.0 } // 63 AC terms
        var h = 0L
        var i = 0
        var k = 0
        while (i < 64) {
          if (i != 0) { if (ac(k) > med) h |= (1L << i); k += 1 }
          i += 1
        }
        Some(h)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Image near-dup candidate pairs: banded Hamming join over the
    * perceptual hash — literally [[Dedup.simhashCandidates]] on the
    * aHash column (4×16-bit bands, in-bucket pair expansion, bucket
    * cap). Same 100 TB shape as text SimHash: candidates ~linear,
    * never O(n²).
    */
  def imageNearDupPairs(df: DataFrame, maxHamming: Int = 5,
      maxBucket: Int = 1000): DataFrame =
    Dedup.simhashCandidates(
      aHash(df).withColumnRenamed("ahash", "simhash"), maxHamming, maxBucket)

  /** REAL audio feature extraction via the JDK-built-in
    * `javax.sound.sampled` (WAV/AU/AIFF containers, PCM codecs — no
    * external library). Decodes to 16-bit signed PCM, mixes channels
    * to mono, and emits per-window RMS energy — the
    * silence-detection / level-normalization feature a speech-data
    * pipeline filters on. Partition-batched, map-side only; blobs the
    * sound API cannot parse are dropped.
    */
  def audioFeatures(df: DataFrame, window: Int = 1024): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("data")).as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        decodeAudioOne(bytes, window).map { case (rate, ch, n, rms) =>
          AudioFeatures(id, rate, ch, n, rms)
        }
      }
    }
  }

  /** 64-bit audio fingerprint from the RMS energy ENVELOPE: the
    * per-window RMS curve average-pools into 64 equal-time buckets,
    * bit i set iff bucket i exceeds the curve mean — the aHash idea
    * lifted to the time axis. Mean-thresholding makes it loudness-
    * invariant (uniform gain scales curve and mean together), and
    * the fixed pooling makes clips of different lengths comparable.
    * Map-side only.
    */
  def audioFingerprint(df: DataFrame, window: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("data")).as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        decodeAudioOne(bytes, window)
          .flatMap { case (_, _, _, rms) => audioFingerprintOne(rms) }
          .map(sig => (id, sig))
      }
    }.toDF("id", "afp")
  }

  private[graft] def audioFingerprintOne(rms: Array[Double]): Option[Long] = {
    if (rms == null || rms.length == 0) return None
    val n = 64
    val pooled = new Array[Double](n)
    val counts = new Array[Int](n)
    var i = 0
    while (i < rms.length) {
      val b = (i.toLong * n / rms.length).toInt
      pooled(b) += rms(i); counts(b) += 1; i += 1
    }
    var j = 0
    while (j < n) { if (counts(j) > 0) pooled(j) /= counts(j); j += 1 }
    val mean = pooled.sum / n
    var sig = 0L
    var k = 0
    while (k < n) { if (pooled(k) > mean) sig |= (1L << k); k += 1 }
    Some(sig)
  }

  /** Audio near-dup candidate pairs by banded Hamming distance on the
    * envelope fingerprint — same 100 TB shape as [[imageNearDupPairs]]
    * and text SimHash (4×16-bit bands, in-bucket expansion, cap).
    */
  def audioNearDupPairs(df: DataFrame, maxHamming: Int = 5,
      maxBucket: Int = 1000): DataFrame =
    Dedup.simhashCandidates(
      audioFingerprint(df).withColumnRenamed("afp", "simhash"), maxHamming, maxBucket)

  private[graft] def decodeAudioOne(bytes: Array[Byte],
      window: Int): Option[(Double, Int, Long, Array[Double])] = {
    if (bytes == null) return None
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val src = ais.getFormat
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
        src.getSampleRate, false)
      val pcm  = AudioSystem.getAudioInputStream(pcmFmt, ais)
      val data = pcm.readAllBytes()
      val ch = pcmFmt.getChannels
      val nFrames = data.length / (2 * ch)
      val mono = new Array[Double](nFrames)
      var i = 0
      while (i < nFrames) {
        var s = 0.0
        var c = 0
        while (c < ch) {
          val off = (i * ch + c) * 2 // little-endian signed 16-bit
          s += ((data(off + 1) << 8) | (data(off) & 0xff)).toShort / 32768.0
          c += 1
        }
        mono(i) = s / ch
        i += 1
      }
      val rms = mono.grouped(window)
        .map(w => math.sqrt(w.map(x => x * x).sum / w.length)).toArray
      Some((src.getSampleRate.toDouble, ch, nFrames.toLong, rms))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ───────────────────────── video containers ─────────────────────────

  final case class VideoHeader(container: String, width: Int, height: Int,
      duration_ms: Long, codec: String)
  final case class VideoMeta(id: Long, n_bytes: Long, container: String,
      width: Int, height: Int, duration_ms: Long, codec: String)

  /** Parse a real video CONTAINER header — the video twin of
    * [[parseImageHeader]]: MP4/ISO-BMFF (`moov`→`mvhd` timescale/
    * duration, `tkhd` 16.16-fixed dims, `stsd` sample-entry fourcc),
    * AVI/RIFF (`avih` dims + µs-per-frame × total-frames, `strh`
    * `vids` handler fourcc), and WebM/Matroska (EBML vint walk:
    * Segment→Info TimecodeScale/Duration, Tracks→TrackEntry CodecID +
    * Video PixelWidth/PixelHeight). Pure byte logic on the first
    * bytes of the blob — container metadata needs no codec, which is
    * exactly why a 100 TB curation pass can afford it on every row.
    * Returns None for unrecognized bytes.
    */
  private[graft] def parseVideoHeader(bytes: Array[Byte]): Option[VideoHeader] = try {
    if (bytes == null || bytes.length < 12) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = ((be16(i).toLong << 16) | be16(i + 2)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (le16(i).toLong | (le16(i + 2).toLong << 16)) & 0xffffffffL
    def fourcc(i: Int): String = new String(bytes, i, 4, "ISO-8859-1")
    val n = bytes.length

    if (n >= 12 && fourcc(4) == "ftyp") {
      // ISO base media file: walk top-level boxes, then recurse into
      // the container boxes that matter.
      var timescale = 0L; var duration = 0L
      var w = 0; var h = 0; var codec = ""
      def walk(from: Long, to: Long, depth: Int): Unit = {
        var i = from
        while (i + 8 <= to && depth < 8) {
          var sz = be32(i.toInt)
          val typ = fourcc(i.toInt + 4)
          var hdr = 8L
          if (sz == 1L && i + 16 <= to) { sz = be64(i.toInt + 8); hdr = 16L }
          else if (sz == 0L) sz = to - i
          if (sz < hdr) return
          val end = math.min(i + sz, to)
          typ match {
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              walk(i + hdr, end, depth + 1)
            case "mvhd" if timescale == 0L =>
              val p = (i + hdr).toInt
              if (u8(p) == 1 && p + 28 <= n) { timescale = be32(p + 20); duration = be64(p + 24) }
              else if (p + 20 <= n) { timescale = be32(p + 12); duration = be32(p + 16) }
            case "tkhd" if w == 0 =>
              val p = (i + hdr).toInt
              val off = if (u8(p) == 1) 88 else 76
              if (p + off + 8 <= n) {
                w = (be32(p + off) >> 16).toInt
                h = (be32(p + off + 4) >> 16).toInt
              }
            case "stsd" if codec.isEmpty =>
              val p = (i + hdr).toInt
              if (p + 16 <= n && be32(p + 4) >= 1) codec = fourcc(p + 12)
            case _ => ()
          }
          i = end
        }
      }
      walk(0L, n.toLong, 0)
      val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
      Some(VideoHeader("mp4", w, h, durMs, codec))
    } else if (n >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ") {
      // RIFF chunks: scan for avih (main header) and the first vids strh
      var usPerFrame = 0L; var totalFrames = 0L
      var w = 0; var h = 0; var codec = ""
      var i = 12
      def scan(from: Int, to: Int, depth: Int): Unit = {
        var j = from
        while (j + 8 <= to && depth < 6) {
          val ck = fourcc(j)
          val sz = le32(j + 4)
          val body = j + 8
          val end = math.min(body + sz, to.toLong).toInt
          if (ck == "LIST") scan(body + 4, end, depth + 1)
          else if (ck == "avih" && body + 40 <= n) {
            usPerFrame = le32(body); totalFrames = le32(body + 16)
            w = le32(body + 32).toInt; h = le32(body + 36).toInt
          } else if (ck == "strh" && body + 12 <= n && fourcc(body) == "vids" && codec.isEmpty)
            codec = fourcc(body + 4)
          j = end + (sz.toInt & 1) // RIFF chunks are 2-byte aligned
        }
      }
      scan(i, n, 0)
      // Both factors are unsigned 32-bit reads (each up to ~4.3e9); a
      // corrupt header can overflow Long in the product — clamp to 0.
      val durMs =
        if (usPerFrame > 0 && totalFrames > Long.MaxValue / usPerFrame) 0L
        else usPerFrame * totalFrames / 1000L
      Some(VideoHeader("avi", w, h, durMs, codec))
    } else if (u8(0) == 0x1a && u8(1) == 0x45 && u8(2) == 0xdf && u8(3) == 0xa3) {
      // Matroska/WebM: EBML vints — IDs keep their marker bits, sizes strip them
      var pos = 0
      def vint(keepMarker: Boolean): Long = {
        if (pos >= n) return -1L
        val first = u8(pos)
        var len = 1
        var mask = 0x80
        while (len <= 8 && (first & mask) == 0) { len += 1; mask >>= 1 }
        if (len > 8 || pos + len > n) { pos = n; return -1L }
        var v = if (keepMarker) first.toLong else (first & (mask - 1)).toLong
        var k = 1
        while (k < len) { v = (v << 8) | u8(pos + k); k += 1 }
        pos += len
        v
      }
      var tcScale = 1000000L; var durationTc = 0.0
      var w = 0; var h = 0; var codec = ""
      def walkEbml(to: Int, depth: Int): Unit = {
        while (pos < to && depth < 8) {
          val id = vint(keepMarker = true)
          val sz = vint(keepMarker = false)
          if (id < 0 || sz < 0) return
          val end = math.min(pos + sz, to.toLong).toInt
          id match {
            case 0x18538067L | 0x1549A966L | 0x1654AE6BL | 0xAEL | 0xE0L => // Segment/Info/Tracks/TrackEntry/Video
              walkEbml(end, depth + 1)
            case 0x2AD7B1L => // TimecodeScale (uint)
              var v = 0L; var k = pos; while (k < end) { v = (v << 8) | u8(k); k += 1 }
              tcScale = v; pos = end
            case 0x4489L => // Duration (float 4/8 bytes)
              if (sz == 4 && pos + 4 <= n)
                durationTc = java.lang.Float.intBitsToFloat(be32(pos).toInt).toDouble
              else if (sz == 8 && pos + 8 <= n)
                durationTc = java.lang.Double.longBitsToDouble(be64(pos))
              pos = end
            case 0x86L => // CodecID (ascii) — length clamped to bytes present
              if (codec.isEmpty && end > pos)
                codec = new String(bytes, pos, end - pos, "ISO-8859-1")
              pos = end
            case 0xB0L => // PixelWidth
              var v = 0L; var k = pos; while (k < end) { v = (v << 8) | u8(k); k += 1 }
              w = v.toInt; pos = end
            case 0xBAL => // PixelHeight
              var v = 0L; var k = pos; while (k < end) { v = (v << 8) | u8(k); k += 1 }
              h = v.toInt; pos = end
            case _ => pos = end
          }
        }
      }
      walkEbml(n, 0)
      val durMs = (durationTc * tcScale / 1e6).toLong
      Some(VideoHeader("webm", w, h, durMs, codec))
    } else None
  } catch {
    // A truncated/corrupt container must classify as unrecognized, not
    // fail the task — same contract as parseImageHeader/parseAudioHeader.
    case scala.util.control.NonFatal(_) => None
  }

  /** Partition-batched video-container decode → typed metadata; bytes
    * that are no known video container come back as "unknown" with
    * zero dims (the drop-filter shape, exactly like [[decodeImageMeta]]).
    */
  def decodeVideoMeta(df: DataFrame): Dataset[VideoMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("data")).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val nb = if (bytes == null) 0L else bytes.length.toLong
        parseVideoHeader(bytes) match {
          case Some(v) => VideoMeta(id, nb, v.container, v.width, v.height,
            v.duration_ms, v.codec)
          case None => VideoMeta(id, nb, "unknown", 0, 0, 0L, "")
        }
      }
    }
  }
}
