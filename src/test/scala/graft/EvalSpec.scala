package graft

import graft.operators.{Eval, Graph, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {

  test("binaryAuc: perfect separation is 1.0, anti-separation is 0.0") {
    import spark.implicits._
    val df = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("s", "y")
    val auc = Eval.binaryAuc(df, col("s"), col("y")).collect()(0)
    assert(auc.getAs[Long]("n") == 4L)
    assert(auc.getAs[Double]("auc") == 1.0)
    val anti = Eval.binaryAuc(df, -col("s"), col("y")).collect()(0)
    assert(anti.getAs[Double]("auc") == 0.0)
  }

  test("binaryAuc: all-tied scores give exactly 0.5 (midrank correction)") {
    import spark.implicits._
    val df = Seq((7L, true), (7L, false), (7L, true), (7L, false), (7L, false))
      .toDF("s", "y")
    val auc = Eval.binaryAuc(df, col("s"), col("y")).collect()(0)
    assert(auc.getAs[Double]("auc") == 0.5)
  }

  test("binaryAuc matches the pair-counting definition on a mixed case") {
    import spark.implicits._
    // AUC = P(score_pos > score_neg) + 0.5 P(equal), counted by hand
    val rows = Seq((1L, false), (2L, true), (2L, false), (3L, true), (4L, false))
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val pairs = for { p <- pos; q <- neg } yield
      if (p > q) 1.0 else if (p == q) 0.5 else 0.0
    val expect = math.round(pairs.sum / pairs.size * 1e6) / 1e6
    val auc = Eval.binaryAuc(rows.toDF("s", "y"), col("s"), col("y"))
      .collect()(0).getAs[Double]("auc")
    assert(auc == expect, s"$auc vs $expect")
  }

  test("calibration: bins partition the rows; a perfectly calibrated bin has brier = p(1-p)") {
    import spark.implicits._
    // 10 rows at p=0.2 with exactly 2 positives: mean_pred = pos_rate,
    // brier = 0.2*0.8 = 0.16
    val rows = (1 to 10).map(i => (200000L, i <= 2))
    val out = Eval.calibration(rows.toDF("p_u", "y"), col("p_u"), col("y"), bins = 10)
      .collect()
    assert(out.map(_.getAs[Long]("n")).sum == 10L)
    val b = out.head
    assert(b.getAs[Double]("mean_pred") == 0.2)
    assert(b.getAs[Double]("pos_rate") == 0.2)
    assert(b.getAs[Double]("brier") == 0.16)
  }

  test("calibration: p_u = 1e6 lands in the top bin, 0 in the bottom") {
    import spark.implicits._
    val rows = Seq((0L, false), (1000000L, true)).toDF("p_u", "y")
    val out = Eval.calibration(rows, col("p_u"), col("y"), bins = 10)
      .collect().map(r => r.getAs[Long]("bin")).sorted
    assert(out.toSeq == Seq(0L, 9L))
  }

  test("woeIv: symmetric classes give woe 0; monotone with enrichment") {
    import spark.implicits._
    val rows = Seq.fill(50)(("a", true)) ++ Seq.fill(50)(("a", false)) ++
      Seq.fill(80)(("b", true)) ++ Seq.fill(20)(("b", false))
    val out = Eval.woeIv(rows.toDF("cat", "y"), col("cat"), col("y"))
      .collect().map(r => r.getAs[String]("cat") -> r.getAs[Double]("woe")).toMap
    // class b is positive-enriched vs the base rate → positive woe;
    // class a is below the base rate → negative
    assert(out("b") > 0.0)
    assert(out("a") < 0.0)
  }

  test("targetEncodeLoo excludes the row's own label") {
    import spark.implicits._
    // one group of 3: two positives + the probe negative. With m=1 and
    // global prior, LOO for the negative row sees 2/2 positives.
    val rows = Seq((10L, "g", true), (11L, "g", true), (12L, "g", false))
      .toDF("id", "k", "y")
    val out = Eval.targetEncodeLoo(rows, col("k"), col("y"), m = 1)
      .select(col("id"), col("enc_u")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("enc_u")).toMap
    // prior = 2/3 → 666666 u. neg row: (2*1e6 + 666666) / 3 = 888888
    assert(out(12L) == (2L * 1000000L + 666666L) / 3L)
    // pos rows: (1*1e6 + 666666) / 3
    assert(out(10L) == (1000000L + 666666L) / 3L)
    assert(out(10L) == out(11L))
  }

  test("localClustering: a triangle plus a pendant edge") {
    import spark.implicits._
    // K3 on {1,2,3} + edge 3-4: nodes 1,2 have cc=1 (deg 2, 1 tri);
    // node 3 has deg 3, 1 triangle → cc = 2/(3·2) = 0.333333; node 4
    // deg 1 → filtered out
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graph.localClustering(edges, "a", "b").collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("n_tri"), r.getAs[Double]("local_cc"))).toMap
    assert(!out.contains(4L))
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((3L, 1L, 0.333333)))
  }

  test("gridDbscan: dense blob is core, satellite is border, far point is noise") {
    import spark.implicits._
    // 2-d embeddings (rest of dims zero): five points clustered at the
    // origin (pairwise ≤ eps), one at distance 0.8 from the blob edge
    // (within eps of blob points but with < minPts neighbors), one far
    // away. eps=1, minPts=4.
    def v(x: Double, y: Double): Array[Float] = Array(x.toFloat, y.toFloat, 0f, 0f)
    val pts = Seq(
      (1L, v(0.0, 0.0)), (2L, v(0.3, 0.0)), (3L, v(0.0, 0.3)),
      (4L, v(-0.3, 0.0)), (5L, v(0.0, -0.3)),
      (6L, v(1.2, 0.0)),   // within 1.0 of ids 1,2 only → border
      (7L, v(5.0, 5.0)))   // noise
      .toDF("vec_id", "embedding")
    val out = Similarity.gridDbscan(pts, "vec_id", "embedding", eps = 1.0, minPts = 4)
      .collect().map(r => r.getAs[Long]("pid") -> r.getAs[String]("role")).toMap
    assert((1L to 5L).forall(i => out(i) == "core"), out.toString)
    assert(out(6L) == "border", out.toString)
    assert(out(7L) == "noise", out.toString)
  }

  test("zipfSlope: an exact power law recovers slope -1") {
    import spark.implicits._
    // token t_r repeated round(1000/r) times in one doc each → freq ∝ 1/r
    val docs = (1 to 40).flatMap { r =>
      val n = math.max(1000 / r, 5)
      Seq(("s", (s"tok${"%03d".format(r)} " * n).trim))
    }.toDF("source", "text")
    val slope = TextAnalysis.zipfSlope(docs, "source", "text", minCount = 5L, topK = 40)
      .collect()(0).getAs[Double]("zipf_slope")
    assert(math.abs(slope + 1.0) < 0.02, s"slope=$slope")
  }
}
