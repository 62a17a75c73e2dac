package graft

import graft.functions.vector
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("vector dot / norm / cosine / l2 match hand math") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 1.0f))).toDF("a", "b")
      .select(
        vector.dot(col("a"), col("b")).as("dot"),
        vector.norm(col("a")).as("na"),
        vector.cosine(col("a"), col("b")).as("cos"),
        vector.l2(col("a"), col("b")).as("l2"))
    val r = df.collect().head
    assert(math.abs(r.getDouble(0) - 4.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-9)
    assert(math.abs(r.getDouble(3) - math.sqrt(1 + 4 + 1)) < 1e-9)
  }

  test("cosine of a zero vector is null, not NaN") {
    import spark.implicits._
    val r = Seq((Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      .select(vector.cosine(col("a"), col("b")).as("c")).collect().head
    assert(r.isNullAt(0))
  }

  test("brute-force top-k returns the true nearest neighbors, self first") {
    val emb = Tables(spark, sf("x"), "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "q_id", "q_vec", 5)
      .orderBy("rank").collect()
    assert(top.length == 5)
    assert(top.head.getAs[Long]("vec_id") == 0L)     // self is its own nearest
    assert(top.head.getAs[Double]("cos") == 1.0)
    val cosines = top.map(_.getAs[Double]("cos")).toSeq
    assert(cosines == cosines.sorted.reverse)
  }

  test("LSH top-k recall vs brute force is reasonable on sf0.001") {
    val emb = Tables(spark, sf("x"), "embeddings")
    val q = emb.filter(col("vec_id") % 199 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "q_id", "q_vec", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val approx = Similarity.lshTopK(emb, q, "vec_id", "embedding", "q_id", "q_vec",
      dim = 64, k = 5, bits = 4, bands = 8)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall too low")
    // every query finds itself (cos=1 in some shared bucket by construction)
    assert(approx.nonEmpty)
  }

  test("int8 quantization: byte range, ≲1% cosine error, zero-vector safe, round-trip shape") {
    import spark.implicits._
    import graft.functions.vector
    val rnd = new scala.util.Random(5)
    val rows = (1L to 200L).map(i =>
      (i, Array.fill(64)((rnd.nextGaussian() * (1 + i % 7)).toFloat))) :+
      (999L, Array.fill(64)(0.0f))
    val df = rows.toDF("id", "emb")
    val q = Similarity.dequantizeInt8(Similarity.quantizeInt8(df, "emb"), "emb")
    // every quantized component is a byte in [-127, 127]
    val maxAbsQ = q.select(max(array_max(transform(col("emb_q8"),
      x => abs(x.cast("int")))))).head().getInt(0)
    assert(maxAbsQ <= 127)
    // cosine(original, dequantized) ≈ 1 for non-zero vectors
    val worst = q.filter(col("id") =!= 999L)
      .select(min(vector.cosine(col("emb"), col("emb_deq")))).head().getDouble(0)
    assert(worst > 0.99, s"worst cosine after int8 round-trip: $worst")
    // zero vector stays zero, no division error
    val z = q.filter(col("id") === 999L)
      .select(array_max(col("emb_deq"))).head().getFloat(0)
    assert(z == 0.0f)
  }

  test("randomProject: 64→32 dims preserves angles within JL tolerance on real embeddings") {
    val emb = Tables(spark, sf("embeddings"), "embeddings").limit(100)
    def meanDev(outDim: Int): Double = {
      val rp = Similarity.randomProject(emb, "embedding", dim = 64, outDim = outDim)
      val a = rp.select(col("vec_id").as("ia"), col("embedding").as("va"),
        col("embedding_rp").as("pa"))
      val b = rp.select(col("vec_id").as("ib"), col("embedding").as("vb"),
        col("embedding_rp").as("pb"))
      a.crossJoin(b).filter(col("ia") < col("ib"))
        .select(abs(vector.cosine(col("va"), col("vb")) -
          vector.cosine(col("pa"), col("pb"))).as("d"))
        .agg(avg(col("d"))).head().getDouble(0)
    }
    // JL: mean angular deviation ~ √(ln n / k) — bounded at k=32, and
    // strictly improving as k grows
    val (d16, d32, d48) = (meanDev(16), meanDev(32), meanDev(48))
    assert(d32 < 0.20, s"mean cosine deviation at 32 dims: $d32")
    assert(d16 > d32 && d32 > d48,
      s"deviation must shrink with outDim: 16→$d16, 32→$d32, 48→$d48")
    // output really is outDim wide
    val rp32 = Similarity.randomProject(emb, "embedding", dim = 64, outDim = 32)
    assert(rp32.select(size(col("embedding_rp"))).head().getInt(0) == 32)
  }

  test("kmeansAssign: full coverage, valid cells, Lloyd objective improves over init") {
    val emb = Tables(spark, sf("embeddings"), "embeddings")
    val n = emb.count()
    def run(iters: Int) =
      Similarity.kmeansAssign(emb, "vec_id", "embedding", dim = 64, k = 8, iters = iters)
    val a5 = run(5).cache()
    // every vector assigned exactly once, to a valid cell
    assert(a5.count() == n)
    val cells = a5.select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf((0 until 8).toSet) && cells.size >= 2)
    // Lloyd's monotonicity: mean centroid cosine after 5 iterations is
    // no worse than after 1 (tolerance for the 4dp rounding of cos)
    def meanCos(df: org.apache.spark.sql.DataFrame) =
      df.agg(avg(col("cos"))).head().getDouble(0)
    val (m1, m5) = (meanCos(run(1)), meanCos(a5))
    assert(m5 >= m1 - 1e-4, s"objective regressed: iters=1 → $m1, iters=5 → $m5")
    a5.unpersist()
  }
}
