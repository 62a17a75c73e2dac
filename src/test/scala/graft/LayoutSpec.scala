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

  test("hilbert index: a bijection whose consecutive indices are ALWAYS grid-adjacent (exhaustive at order 4 and 6)") {
    import graft.functions.HilbertIndex
    Seq(4, 6).foreach { bits =>
      val n = 1 << bits
      val d2xy = Array.fill(n.toLong.toInt * n)((-1, -1))
      for (x <- 0 until n; y <- 0 until n) {
        val d = HilbertIndex.xy2d(bits, x.toLong, y.toLong).toInt
        assert(d >= 0 && d < n * n, s"d=$d out of range at ($x,$y) order $bits")
        assert(d2xy(d) == ((-1, -1)), s"collision at d=$d order $bits")
        d2xy(d) = (x, y)
      }
      (1 until n * n).foreach { d =>
        val (x0, y0) = d2xy(d - 1); val (x1, y1) = d2xy(d)
        assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
          s"jump between d=${d - 1} and d=$d at order $bits")
      }
    }
  }

  test("hilbert_index codegen matches the interpreted walk; order 4 matches q261's unrolled arithmetic") {
    import spark.implicits._
    import graft.functions.HilbertIndex
    val rnd = new scala.util.Random(11)
    val pairs = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L)) ++
      Seq.fill(300)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .withColumn("d", Layout.hilbertKey(col("x"), col("y")))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == HilbertIndex.xy2d(16, r.getLong(0), r.getLong(1)),
        s"hilbert(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("hilbertBy writes range-disjoint files whose (a,b) rectangles are TIGHTER than a box scan needs: a box predicate touches a strict subset") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(4000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong,
      rnd.nextInt())).toDF("a", "b", "v")
    val out = java.nio.file.Files.createTempDirectory("graft-hilbert").toString + "/t"
    Layout.hilbertBy(df, col("a"), col("b"), numFiles = 8).write.parquet(out)
    // per-file hilbert ranges are disjoint (the range partitioner's contract)
    val perFile = spark.read.parquet(out)
      .withColumn("d", Layout.hilbertKey(col("a"), col("b")))
      .withColumn("f", col("_metadata.file_path"))
      .groupBy("f").agg(min("d").as("lo"), max("d").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "overlapping hilbert ranges")
      case _ =>
    }
    // locality: a small (a,b) box touches a strict subset of files
    val touched = spark.read.parquet(out)
      .filter(col("a") < 8192 && col("b") < 8192)
      .select(col("_metadata.file_path")).distinct().count()
    assert(touched < perFile.length,
      s"a 1/64-area box should not touch all ${perFile.length} files ($touched)")
  }
  test("pruning effectiveness: Hilbert vs Morton vs linear layouts under a mixed box workload (manifest-rectangle proxy)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = Seq.fill(8000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("a", "b")
    val root = java.nio.file.Files.createTempDirectory("graft-prunecmp").toString
    Layout.hilbertBy(df, col("a"), col("b"), numFiles = 16)
      .write.parquet(s"$root/hilbert")
    Layout.zorderBy(df, col("a"), col("b"), numFiles = 16)
      .write.parquet(s"$root/morton")
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.parquet(s"$root/linear")
    // per-file (a,b) bounding rectangles — exactly the manifest min/max
    // stats a snapshot scan prunes with
    def rects(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path).withColumn("f", col("_metadata.file_path"))
        .groupBy("f").agg(min("a"), max("a"), min("b"), max("b"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val layouts = Map("hilbert" -> rects(s"$root/hilbert"),
      "morton" -> rects(s"$root/morton"), "linear" -> rects(s"$root/linear"))
    layouts.values.foreach(r => assert(r.length == 16))
    // mixed workload: a 4x4 grid of square (a,b) boxes + 4 a-slabs + 4 b-slabs
    val q = 16384L
    val boxes =
      (for (i <- 0 until 4; j <- 0 until 4)
        yield (i * q, (i + 1) * q, j * q, (j + 1) * q)) ++
      (0 until 4).map(i => (i * q, (i + 1) * q, 0L, 65536L)) ++
      (0 until 4).map(j => (0L, 65536L, j * q, (j + 1) * q))
    def touched(rs: Array[(Long, Long, Long, Long)],
        box: (Long, Long, Long, Long)): Int =
      rs.count { case (alo, ahi, blo, bhi) =>
        ahi >= box._1 && alo < box._2 && bhi >= box._3 && blo < box._4 }
    def avg(name: String): Double = {
      val rs = layouts(name)
      boxes.map(b => touched(rs, b)).sum.toDouble / boxes.size
    }
    val (h, m, l) = (avg("hilbert"), avg("morton"), avg("linear"))
    info(f"avg files touched of 16 - hilbert: $h%.2f, morton: $m%.2f, linear: $l%.2f")
    // linear serves only its sort column: every b-slab hits ALL files
    val bSlabs = (0 until 4).map(j => (0L, 65536L, j * q, (j + 1) * q))
    assert(bSlabs.forall(b => touched(layouts("linear"), b) == 16),
      "a linear-by-a layout cannot prune b-only predicates")
    assert(bSlabs.forall(b => touched(layouts("hilbert"), b) < 16))
    // space-filling layouts beat linear on the MIXED workload...
    assert(h < l && m < l)
    // ...and Hilbert's adjacency-preserving walk yields rectangles at
    // least as tight as Morton's jump-prone one on average
    assert(h <= m + 0.5, f"hilbert $h%.2f should not prune worse than morton $m%.2f")
  }
}
