package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf("x"), "documents")

  test("mixtureSample: per-source rates hold approximately, unlisted sources dropped") {
    val bySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Curation.mixtureSample(docs, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.3))
    val out = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("src0") == bySource("src0"))          // rate 1.0 keeps all
    val r1 = out("src1").toDouble / bySource("src1")
    assert(r1 > 0.15 && r1 < 0.45, s"src1 rate $r1") // ~0.3 on small n
    assert(!out.contains("src2"))                    // unlisted → dropped
  }

  test("sampling and split are deterministic across invocations") {
    val a = Curation.mixtureSample(docs, "source", "doc_id", Map("src0" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.mixtureSample(docs, "source", "doc_id", Map("src0" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    val s1 = Curation.split(docs, "doc_id", 0.1, 0.1)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s2 = Curation.split(docs, "doc_id", 0.1, 0.1)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 == s2)
  }

  test("split is exhaustive, disjoint, and roughly proportioned") {
    val s = Curation.split(docs, "doc_id", valFrac = 0.2, testFrac = 0.1)
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.values.sum == n.toLong)            // exhaustive
    assert(counts("val") / n > 0.1 && counts("val") / n < 0.3)
    assert(counts("test") / n > 0.03 && counts("test") / n < 0.2)
    assert(counts("train") / n > 0.6)
    // different salts decorrelate
    val other = Curation.split(docs, "doc_id", 0.2, 0.1, salt = "other")
      .filter(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).toSet
    val mine = s.filter(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != mine)
  }
}
