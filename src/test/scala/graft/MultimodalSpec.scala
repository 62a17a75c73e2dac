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

  test("resizeStub truncates payload bytes") {
    val out = Multimodal.resizeStub(Multimodal.asBinary(media, "doc_id", "payload"), 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Array[Byte]]("data")).toMap
    assert(out(2L).length == 3)
    assert(new String(out(2L)) == "abc")
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

  test("audioFeatureStub emits one feature per window") {
    val feats = Multimodal.audioFeatureStub(
      Multimodal.asBinary(media, "doc_id", "payload"), window = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[scala.collection.Seq[Double]]("features").toSeq).toMap
    assert(feats(2L).length == 2) // 8 bytes / window 4
    assert(feats(3L).isEmpty)
  }
}
