package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    Seq((1L, "abcdef"), (2L, "abcdefgh"), (3L, ""))
      .toDF("doc_id", "payload")
  }

  test("asBinary produces (id, data: binary)") {
    val b = Multimodal.asBinary(media, "doc_id", "payload")
    assert(b.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("id", "long"), ("data", "binary")))
  }

  // real container headers, built byte-for-byte to each format's spec
  private def pngBytes(w: Int, h: Int, colorType: Int): Array[Byte] = {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
  }
  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ Array[Byte]((w & 0xff).toByte, (w >> 8).toByte,
      (h & 0xff).toByte, (h >> 8).toByte, 0, 0, 0)
  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    "BM".getBytes ++ le32(0) ++ le32(0) ++ le32(54) ++ le32(40) ++
      le32(w) ++ le32(h) ++ Array[Byte](1, 0, 24, 0) ++ Array.fill[Byte](8)(0)
  }
  private def jpegBytes(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte,                        // SOI
      0xff.toByte, 0xe0.toByte, 0, 6, 'J', 'F', 'I', 'F',       // APP0 len=6
      0xff.toByte, 0xc0.toByte, 0, 11,                           // SOF0 len=11
      8, (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte, 3)

  test("decodeImageMeta parses real PNG/GIF/BMP/JPEG headers; unknown bytes flagged") {
    import spark.implicits._
    val blobs = Seq(
      (1L, pngBytes(640, 480, 6)),
      (2L, gifBytes(320, 200)),
      (3L, bmpBytes(128, 64)),
      (4L, jpegBytes(1920, 1080)),
      (5L, "not an image at all".getBytes)).toDF("id", "data")
    val meta = Multimodal.decodeImageMeta(blobs).collect().map(m => m.id -> m).toMap
    assert(meta(1L).format == "png"  && meta(1L).width == 640  && meta(1L).height == 480 && meta(1L).channels == 4)
    assert(meta(2L).format == "gif"  && meta(2L).width == 320  && meta(2L).height == 200)
    assert(meta(3L).format == "bmp"  && meta(3L).width == 128  && meta(3L).height == 64  && meta(3L).channels == 3)
    assert(meta(4L).format == "jpeg" && meta(4L).width == 1920 && meta(4L).height == 1080 && meta(4L).channels == 3)
    assert(meta(5L).format == "unknown" && meta(5L).width == 0)
    assert(meta(5L).n_bytes == "not an image at all".getBytes.length.toLong)
  }

  // a real encoded image: left half red, right half blue
  private def encodedImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xFF0000 else 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("dominantColors: modal bucket and exact channel means from real pixels") {
    import spark.implicits._
    // solid red 8x8, and the half-red/half-blue split image
    val solid = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0xFF0000)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val blobs = Seq((1L, solid), (2L, encodedImage("png", 8, 8)),
      (3L, "not an image".getBytes)).toDF("id", "data")
    val out = Multimodal.dominantColors(blobs).collect().map(r => r.id -> r).toMap
    assert(!out.contains(3L), "undecodable blobs are dropped")
    val s = out(1L)
    assert(s.mean_r == 255.0 && s.mean_g == 0.0 && s.mean_b == 0.0)
    assert(s.top_bucket == ((255 >> 6) << 4) && s.top_share == 1.0)
    val h = out(2L) // half red half blue: red bucket wins ties? both 0.5
    assert(math.abs(h.top_share - 0.5) < 1e-12)
    assert(h.mean_r == 127.5 && h.mean_b == 127.5 && h.mean_g == 0.0)
  }

  test("resizeImages really decodes, resamples, and re-encodes pixels (all four JDK formats)") {
    import spark.implicits._
    val blobs = Seq(
      (1L, encodedImage("png", 8, 8)),
      (2L, encodedImage("bmp", 8, 8)),
      (3L, encodedImage("gif", 8, 8)),
      (4L, encodedImage("jpg", 8, 8)),
      (5L, "definitely not an image".getBytes)).toDF("id", "data")
    val out = Multimodal.resizeImages(blobs, 4, 4).collect().map(r => r.id -> r).toMap
    assert(!out.contains(5L), "undecodable blobs are dropped")
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    Seq("png", "bmp", "gif", "jpeg").zip(1L to 4L).foreach { case (fmt, id) =>
      val r = out(id)
      assert(r.src_format == fmt && r.src_width == 8 && r.src_height == 8)
      assert(r.width == 4 && r.height == 4)
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.png))
      assert(dec.getWidth == 4 && dec.getHeight == 4)
      // pixel-level: away from the seam, left stays red, right stays
      // blue (tolerance covers jpeg loss + bilinear filtering)
      val left  = dec.getRGB(0, 1)
      val right = dec.getRGB(3, 2)
      assert(((left >> 16) & 0xff) > 150 && (left & 0xff) < 100,
        f"$fmt left pixel should be red, got 0x$left%08x")
      assert((right & 0xff) > 150 && ((right >> 16) & 0xff) < 100,
        f"$fmt right pixel should be blue, got 0x$right%08x")
    }
  }

  test("frameSample explodes fixed-size frames, keeps every Nth") {
    val frames = Multimodal.frameSample(Multimodal.asBinary(media, "doc_id", "payload"),
      frameBytes = 2, everyN = 2)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("frame_idx"),
        new String(r.getAs[Array[Byte]]("frame"))))
    val byId = frames.groupBy(_._1)
    assert(byId(1L).map(f => (f._2, f._3)).toSet == Set((0L, "ab"), (2L, "ef")))
    assert(byId(2L).map(f => (f._2, f._3)).toSet == Set((0L, "ab"), (2L, "ef")))
    assert(!byId.contains(3L)) // empty payload → no frames
  }

  // a real WAV container around raw 16-bit little-endian PCM frames
  private def wavBytes(samples: Array[Short], channels: Int, rate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      channels, channels * 2, rate, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
      samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioFeatures decodes real WAV PCM: per-window RMS, channel mixing, junk dropped") {
    import spark.implicits._
    // mono: 1024 silent samples then 1024 at ±half-scale (RMS = 0.5)
    val mono = Array.fill[Short](1024)(0) ++
      Array.tabulate[Short](1024)(i => if (i % 2 == 0) 16384 else -16384)
    // stereo whose channels cancel exactly → mono mix ≈ 0
    val stereo = Array.tabulate[Short](2048)(i =>
      if (i % 2 == 0) 12000 else -12000) // frame = (L=+x, R=-x)
    val blobs = Seq(
      (1L, wavBytes(mono, 1, 8000f)),
      (2L, wavBytes(stereo, 2, 16000f)),
      (3L, "white noise? no, just text".getBytes)).toDF("id", "data")
    val out = Multimodal.audioFeatures(blobs, window = 1024).collect().map(r => r.id -> r).toMap
    assert(!out.contains(3L), "non-audio blobs are dropped")
    val m = out(1L)
    assert(m.sample_rate == 8000.0 && m.n_channels == 1 && m.n_samples == 2048L)
    assert(m.rms.length == 2)
    assert(m.rms(0) < 1e-9, s"silent window RMS ${m.rms(0)}")
    assert(math.abs(m.rms(1) - 0.5) < 1e-3, s"half-scale square RMS ${m.rms(1)}")
    val st = out(2L)
    assert(st.n_channels == 2 && st.n_samples == 1024L)
    assert(st.rms.forall(_ < 1e-9), "cancelling channels must mix to silence")
  }

  /** Deterministic structured image: a diagonal luminance gradient
    * with an optional dark square — enough spatial structure for an
    * 8×8 perceptual hash to be meaningful.
    */
  private def patternImage(fmt: String, w: Int, h: Int,
      withSquare: Boolean, invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      var v = ((x + y) * 255) / (w + h - 2)
      if (invert) v = 255 - v
      if (withSquare && x < w / 4 && y < h / 4) v = 0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("aHash: format-invariant for identical pixels, robust to small edits, separates inverses") {
    import spark.implicits._
    val df = Seq(
      (1L, patternImage("png", 64, 64, withSquare = true)),
      (2L, patternImage("bmp", 64, 64, withSquare = true)),  // same pixels, other container
      (3L, patternImage("png", 64, 64, withSquare = false)), // small edit
      (4L, patternImage("png", 64, 64, withSquare = true, invert = true)), // opposite
      (5L, "not an image".getBytes)).toDF("id", "data")
    val h = Multimodal.aHash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!h.contains(5L), "undecodable blobs drop")
    assert(h(1L) == h(2L), "identical pixels, different container → same hash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(3L)) <= 6, s"small edit should flip few bits: ${ham(h(1L), h(3L))}")
    assert(ham(h(1L), h(4L)) >= 32, s"inverse should be far: ${ham(h(1L), h(4L))}")
  }

  test("pHash: brightness/contrast-shift invariant where aHash is format-invariant too") {
    import spark.implicits._
    // gamma-ish brightness lift: v' = 40 + v*0.8 — every pixel moves,
    // but the DCT coefficient ORDER barely does
    def shifted(fmt: String): Array[Byte] = {
      val base = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(patternImage(fmt, 64, 64, withSquare = true)))
      val out = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v0 = base.getRGB(x, y) & 0xff
        val v = math.min(255, 40 + (v0 * 0.8).toInt)
        out.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, fmt, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, patternImage("png", 64, 64, withSquare = true)),
      (2L, shifted("png")),                                  // brightness/contrast shift
      (3L, patternImage("png", 64, 64, withSquare = true, invert = true)),
      (4L, "not an image".getBytes)).toDF("id", "data")
    val h = Multimodal.pHash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(!h.contains(4L), "undecodable blobs drop")
    assert(ham(h(1L), h(2L)) <= 4,
      s"brightness shift must barely move the DCT hash: ${ham(h(1L), h(2L))}")
    // the images share the un-inverted black square, so low-frequency
    // terms partially align — far, but not the pure-negation ~63
    assert(ham(h(1L), h(3L)) >= 16, s"inverse should be far: ${ham(h(1L), h(3L))}")
  }

  test("imageNearDupPairs finds the format-twin and the small edit, not the inverse") {
    import spark.implicits._
    val df = Seq(
      (1L, patternImage("png", 64, 64, withSquare = true)),
      (2L, patternImage("bmp", 64, 64, withSquare = true)),
      (3L, patternImage("png", 64, 64, withSquare = false)),
      (4L, patternImage("png", 64, 64, withSquare = true, invert = true)))
      .toDF("id", "data")
    val pairs = Multimodal.imageNearDupPairs(df, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"inverse must not pair: $pairs")
  }

  test("audioFingerprint: loudness-invariant envelope signature; near-dup pairs found") {
    import spark.implicits._
    // envelope: 32 windows silent, 32 windows loud (1024-sample windows)
    def burst(amp: Short): Array[Short] =
      Array.fill[Short](32 * 1024)(0) ++
        Array.tabulate[Short](32 * 1024)(i => if (i % 2 == 0) amp else (-amp).toShort)
    // reversed envelope: loud first, then silence
    val reversed = Array.tabulate[Short](32 * 1024)(i => if (i % 2 == 0) 16000 else -16000) ++
      Array.fill[Short](32 * 1024)(0)
    val blobs = Seq(
      (1L, wavBytes(burst(16000), 1, 8000f)),
      (2L, wavBytes(burst(4000), 1, 8000f)),   // same shape, 12 dB quieter
      (3L, wavBytes(reversed, 1, 8000f)),
      (4L, "not audio".getBytes)).toDF("id", "data")
    val fp = Multimodal.audioFingerprint(blobs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!fp.contains(4L), "non-audio dropped")
    assert(fp(1L) == fp(2L), "uniform gain must not change the fingerprint")
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) > 20,
      s"reversed envelope must be far in Hamming space: ${fp(1L)} vs ${fp(3L)}")
    val pairs = Multimodal.audioNearDupPairs(blobs, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"gain-scaled duplicate must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"reversed must not pair: $pairs")
  }

  // ───────────────────────── video containers ─────────────────────────

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def fcc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ fcc(typ) ++ payload

  private def mp4Bytes: Array[Byte] = {
    val ftyp = box("ftyp", fcc("isom") ++ be32(0))
    // mvhd v0: flags + creation + modification + timescale=1000 + duration=5000
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(5000))
    // tkhd v0: 76 bytes of fields, then 16.16-fixed width/height
    val tkhd = box("tkhd", Array.fill[Byte](76)(0) ++ be32(640L << 16) ++ be32(360L << 16))
    val stsd = box("stsd", be32(0) ++ be32(1) ++ be32(86) ++ fcc("avc1"))
    val trak = box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsd))))
    ftyp ++ box("moov", mvhd ++ trak)
  }

  private def aviBytes: Array[Byte] = {
    // avih: usPerFrame=33333, totalFrames=300 (+16), width=320 (+32), height=240 (+36)
    val avih = fcc("avih") ++ le32(40) ++
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(300) ++
      le32(0) ++ le32(1) ++ le32(0) ++ le32(320) ++ le32(240)
    val strh = fcc("strh") ++ le32(16) ++ fcc("vids") ++ fcc("mjpg") ++ le32(0) ++ le32(0)
    val hdrl = fcc("LIST") ++ le32((4 + avih.length + strh.length).toLong) ++
      fcc("hdrl") ++ avih ++ strh
    val body = fcc("AVI ") ++ hdrl
    fcc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  private def webmBytes: Array[Byte] = {
    def sz(n: Int): Array[Byte] = Array((0x80 | n).toByte)
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
      id ++ sz(payload.length) ++ payload
    val ebmlHdr = el(Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte), Array[Byte]())
    val tcScale = el(Array(0x2a, 0xd7, 0xb1).map(_.toByte),
      Array(0x0f, 0x42, 0x40).map(_.toByte)) // 1,000,000 ns
    val durBits = java.lang.Float.floatToIntBits(12345.0f).toLong & 0xffffffffL
    val duration = el(Array(0x44, 0x89).map(_.toByte), be32(durBits))
    val info = el(Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte), tcScale ++ duration)
    val codecId = el(Array(0x86.toByte), fcc("V_VP9"))
    val pw = el(Array(0xb0.toByte), Array(0x05, 0x00).map(_.toByte)) // 1280
    val ph = el(Array(0xba.toByte), Array(0x02, 0xd0).map(_.toByte)) // 720
    val video = el(Array(0xe0.toByte), pw ++ ph)
    val trackEntry = el(Array(0xae.toByte), codecId ++ video)
    val tracks = el(Array(0x16, 0x54, 0xae, 0x6b).map(_.toByte), trackEntry)
    val segment = el(Array(0x18, 0x53, 0x80, 0x67).map(_.toByte), info ++ tracks)
    ebmlHdr ++ segment
  }

  test("parseVideoHeader reads MP4 mvhd/tkhd/stsd, AVI avih/strh, WebM EBML exactly") {
    val mp4 = Multimodal.parseVideoHeader(mp4Bytes).get
    assert(mp4.container == "mp4" && mp4.width == 640 && mp4.height == 360 &&
      mp4.duration_ms == 5000L && mp4.codec == "avc1", mp4.toString)
    val avi = Multimodal.parseVideoHeader(aviBytes).get
    assert(avi.container == "avi" && avi.width == 320 && avi.height == 240 &&
      avi.duration_ms == 33333L * 300 / 1000 && avi.codec == "mjpg", avi.toString)
    val webm = Multimodal.parseVideoHeader(webmBytes).get
    assert(webm.container == "webm" && webm.width == 1280 && webm.height == 720 &&
      webm.duration_ms == 12345L && webm.codec == "V_VP9", webm.toString)
    assert(Multimodal.parseVideoHeader("not a video".getBytes).isEmpty)
    assert(Multimodal.parseVideoHeader(null).isEmpty)
  }

  test("decodeVideoMeta: map-side container decode, junk flagged unknown") {
    import spark.implicits._
    val df = Seq(
      (1L, mp4Bytes), (2L, aviBytes), (3L, webmBytes),
      (4L, "plain text bytes".getBytes)).toDF("id", "data")
    val got = Multimodal.decodeVideoMeta(df).collect()
      .map(m => m.id -> ((m.container, m.width, m.height, m.duration_ms, m.codec))).toMap
    assert(got(1L) == (("mp4", 640, 360, 5000L, "avc1")))
    assert(got(2L) == (("avi", 320, 240, 9999L, "mjpg")))
    assert(got(3L) == (("webm", 1280, 720, 12345L, "V_VP9")))
    assert(got(4L) == (("unknown", 0, 0, 0L, "")))
  }
}
