package graft.operators

import graft.functions.vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale shape: the query set is always the small side — broadcast it,
  * scan the corpus exactly once, and keep only top-k per query. The
  * corpus is never shuffled in full: the row_number window operates on
  * (|queries| × |corpus|) scored rows *after* projection to
  * (query_id, id, cos) — 3 narrow columns — and at 1000 executors the
  * LSH variant cuts the scored space to candidate buckets only.
  */
object Similarity {

  /** Exact brute-force top-k cosine (the correctness baseline).
    * Cosine is rounded to 4dp before ranking, ties broken by id — so
    * ranking is reproducible across engines and partitionings.
    *
    * Ranking is the bounded [[graft.functions.TopKByScore]] aggregate,
    * not a row_number window: the window form shuffles every scored
    * row into |queries| reducers (skewed, unbounded memory) before
    * discarding all but k; the aggregate keeps ≤ k per query per map
    * task, so the shuffle is O(partitions·k) rows however large the
    * corpus.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, qId: String, qVec: String, k: Int): DataFrame =
    rankTopK(
      corpus.crossJoin(broadcast(queries))
        .select(col(qId), col(id),
          round(vector.cosine(col(vec), col(qVec)), 4).as("cos")),
      qId, id, k)

  /** groupBy(qId) + bounded top-k agg + explode back to ranked rows. */
  private def rankTopK(scored: DataFrame, qId: String, id: String, k: Int): DataFrame =
    scored
      .groupBy(col(qId))
      .agg(vector.topKBy(col("cos"), col(id).cast("long"), k).as("top"))
      .select(col(qId), explode(col("top")).as("t"))
      .select(col(qId), col("t.id").as(id), col("t.score").as("cos"),
        col("t.rank").as("rank"))

  /** Deterministic pseudo-gaussian hyperplanes (fixed seed). */
  private[graft] def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket per band of `bits` random hyperplanes: returns
    * df + `bucket_<band>` int columns. Used both for ANN candidate
    * generation and as the blocking key for embedding dedup at scale.
    */
  def hyperplaneBuckets(df: DataFrame, vec: String, dim: Int,
      bits: Int, bands: Int, seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(dim, bits * bands, seed)
    (0 until bands).foldLeft(df) { (d, bi) =>
      val key = (0 until bits).map { j =>
        val p = planes(bi * bits + j).toSeq
        when(vector.dot(col(vec), typedLit(p)) >= 0.0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      d.withColumn(s"bucket_$bi", key)
    }
  }

  /** LSH-bucketed ANN: candidates = corpus rows sharing any band
    * bucket with the query; exact cosine re-rank within candidates.
    * Recall < 1 by design; raise `bands` (more candidates) or lower
    * `bits` (bigger buckets) to trade cost for recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, qId: String, qVec: String,
      dim: Int, k: Int, bits: Int = 4, bands: Int = 4): DataFrame = {
    val cb = hyperplaneBuckets(corpus, vec, dim, bits, bands)
    val qb = hyperplaneBuckets(queries, qVec, dim, bits, bands)
    val bandStruct = (d: DataFrame, idc: String, vc: String) =>
      d.select(col(idc), col(vc),
        explode(array((0 until bands).map(bi =>
          struct(lit(bi).as("band"), col(s"bucket_$bi").as("key"))): _*)).as("b"))
        .select(col(idc), col(vc), col("b.band").as("band"), col("b.key").as("key"))
    val c = bandStruct(cb, id, vec)
    val q = bandStruct(qb, qId, qVec)
    val cand = c.join(broadcast(q), Seq("band", "key"))
      .select(col(qId), col(qVec), col(id), col(vec)).distinct()
    rankTopK(
      cand.select(col(qId), col(id),
        round(vector.cosine(col(vec), col(qVec)), 4).as("cos")),
      qId, id, k)
  }
}
