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

  test("co-bucketed tables sort-merge join with ZERO exchanges; key filter prunes to one bucket") {
    val s = spark
    val li = Tables(s, sf("any"), "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables(s, sf("any"), "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Layout.writeBucketed(li, "li_bkt", "l_orderkey", buckets = 8)
      Layout.writeBucketed(ord, "ord_bkt", "l_orderkey", buckets = 8)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = s.table("li_bkt").join(s.table("ord_bkt"), "l_orderkey")
        .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$p")
      // same rows as the plain (shuffling) join
      val expected = li.join(ord, "l_orderkey").count()
      assert(j.count() == expected)
      // equality predicate on the bucket key scans ONE bucket file set
      // (auto-bucketed-scan turns bucketed reading off for a bare
      // filter, which also forfeits pruning — pin it on for the check)
      s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val pruned = s.table("li_bkt").filter(col("l_orderkey") === 5L)
        .queryExecution.executedPlan.toString
      assert(pruned.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning missing:\n$pruned")
    } finally {
      s.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS li_bkt")
      s.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
