package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  /** Reference bit-interleave, one bit at a time. */
  private def mortonRef(a: Int, b: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1).toLong << (2 * i)
      z |= ((b >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }

  test("magic-bits morton key equals the bitwise reference on edge + random pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq((0, 0), (1, 0), (0, 1), (0xFFFF, 0xFFFF), (0xFFFF, 0),
      (0x5555, 0xAAAA), (12345, 54321)) ++
      Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val df = pairs.toDF("a", "b")
      .withColumn("z", Layout.mortonKey(col("a").cast("long"), col("b").cast("long")))
    val got = df.select("a", "b", "z").collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getInt(0), r.getInt(1)),
        s"morton(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("spread16 of all-ones is 0x55555555") {
    import spark.implicits._
    val z = Seq(0xFFFFL).toDF("x")
      .select(Layout.spread16(col("x"))).head().getLong(0)
    assert(z == 0x55555555L)
  }

  test("zorderBy writes range-disjoint files: per-file z ranges don't overlap") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(4000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong, rnd.nextInt()))
      .toDF("a", "b", "payload")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.zorderBy(df, col("a"), col("b"), numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    val ranges = spark.read.parquet(dir)
      .withColumn("z", Layout.mortonKey(col("a"), col("b")))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $hi1 > $lo2")
      case _ =>
    }
  }

  test("zorderBy plans a range exchange + LOCAL sort, never a global sort") {
    import spark.implicits._
    val df = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val p = Layout.zorderBy(df, col("a"), col("b"), numFiles = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning") || p.toLowerCase.contains("rangepartitioning"), p)
    // every Sort node must be local (global=false): a global sort would
    // serialize the write through a single ordered stage boundary
    p.linesIterator.filter(_.contains("Sort [")).foreach { l =>
      assert(l.contains("false"), s"global sort in zorder write plan: $l")
    }
  }

  test("z-locality: a box predicate on (a,b) touches a strict subset of files") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(4000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("zloc").toString
    Layout.zorderBy(df, col("a"), col("b"), numFiles = 16)
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).withColumn("f", input_file_name())
    val allFiles = back.select("f").distinct().count()
    // a small corner box in (a, b) space — z-clustering confines it
    val boxFiles = back.filter(col("a") < 4096L && col("b") < 4096L)
      .select("f").distinct().count()
    assert(boxFiles > 0 && boxFiles < allFiles,
      s"box touched $boxFiles of $allFiles files")
  }
}
