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

  test("decodeImageMeta: deterministic stub metadata per row, map-side only") {
    val meta = Multimodal.decodeImageMeta(Multimodal.asBinary(media, "doc_id", "payload"))
      .collect().map(m => m.id -> m).toMap
    assert(meta(1L).n_bytes == 6L && meta(1L).format == "png")
    assert(meta(2L).n_bytes == 8L && meta(2L).format == "webp")
    assert(meta(3L).n_bytes == 0L)
    assert(meta(1L).width == 16 + ('a' & 0x7f))
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
