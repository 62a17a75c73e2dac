package graft

import graft.operators.Clean
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

class CleanSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("country", StringType),
    StructField("web_pages", ArrayType(StringType))))

  private lazy val raw = spark.createDataFrame(
    Seq(
      Row(1L, "  MIT  ", "USA", Seq(" http://mit.edu ", "http://web.mit.edu")),
      Row(2L, null, "USA", Seq("http://x.org")),         // missing name
      Row(3L, "ETH", "  ", Seq("http://ethz.ch")),       // blank country
      Row(4L, "Oxford", "UK", Seq.empty[String]),        // empty web_pages
      Row(5L, "Sorbonne", "France", null),               // null web_pages
      Row(6L, "TUM", "Germany", Seq("http://tum.de"))
    ).asJava, schema)

  test("requireFields drops null/blank strings and empty arrays (server.js:69-76 semantics)") {
    val ok = Clean.requireFields(raw, Seq("name", "country", "web_pages"))
    assert(ok.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 6L))
  }

  test("standardize trims strings and array elements") {
    val out = Clean.standardize(raw.filter(col("id") === 1))
    val r = out.collect().head
    assert(r.getAs[String]("name") == "MIT")
    assert(r.getAs[scala.collection.Seq[String]]("web_pages").toSeq == Seq("http://mit.edu", "http://web.mit.edu"))
  }

  test("firstOf returns the head of a non-empty array, null otherwise") {
    val out = raw.select(col("id"), Clean.firstOf(col("web_pages")).as("primary"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains(" http://mit.edu "))
    assert(out(4L).isEmpty)
    assert(out(5L).isEmpty)
  }

  test("withIngestTimestamp adds last_updated") {
    val out = Clean.withIngestTimestamp(raw, to_timestamp(lit("2026-01-01 00:00:00")))
    assert(out.columns.contains("last_updated"))
    assert(out.select("last_updated").distinct().count() == 1)
  }

  test("qualityReport counts failures per rule in one pass") {
    val rep = Clean.qualityReport(raw, Seq(
      "bad_name" -> (col("name").isNotNull && trim(col("name")) =!= ""),
      "bad_pages" -> (col("web_pages").isNotNull && size(col("web_pages")) > 0)))
      .collect().head
    assert(rep.getAs[Long]("total") == 6L)
    assert(rep.getAs[Long]("bad_name") == 1L)
    assert(rep.getAs[Long]("bad_pages") == 2L)
  }
}
