package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sketch state (Apache DataSketches via Spark's built-in
  * `hll_*` / `theta_*` / `kll_*` / `approx_top_k_*` functions): the
  * incremental-statistics pattern for a 100 TB corpus. The point is
  * not the one-shot estimate (approx_count_distinct does that) — it's
  * that the SKETCH BINARY is the aggregation state: build per-group /
  * per-batch sketches once, persist them, then answer rollups,
  * set-algebra, and quantile questions by merging kilobyte sketches
  * instead of rescanning the corpus.
  *
  * Scale shape: every function here partial-aggregates map-side and
  * shuffles O(groups) sketch binaries (HLL lgK=12 ≈ 2.5 KB, theta
  * k=4096 ≈ 32 KB, KLL k=200 ≈ 5 KB); the merge stages touch only
  * sketches, never the data again.
  */
object Sketches {

  /** Per-group HLL sketches + the merged-from-sketches corpus rollup:
    * one row per group with its distinct-estimate, plus an `__all__`
    * row whose estimate comes from `hll_union_agg` over the GROUP
    * SKETCHES — the re-aggregation never rescans the table (the
    * incremental pattern: persist per-partition/per-day sketches,
    * merge on demand).
    */
  def hllRollup(df: DataFrame, group: String, key: String,
      lgK: Int = 12): DataFrame = {
    // persist the sketch table (O(groups) rows of ~2.5 KB binaries):
    // both the per-group readout and the merged rollup read it, and at
    // scale THIS is the frame you'd write to storage and re-merge
    // incrementally — the data is scanned exactly once
    val perGroup = df.groupBy(col(group).as("grp"))
      .agg(expr(s"hll_sketch_agg($key, $lgK)").as("sk"),
        count(lit(1)).as("n_rows"))
      .persist()
    val groups = perGroup.select(col("grp"),
      expr("hll_sketch_estimate(sk)").as("approx_distinct"), col("n_rows"))
    val merged = perGroup.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_distinct"),
      sum(col("n_rows")).as("n_rows"))
      .select(lit("__all__").as("grp"), col("approx_distinct"), col("n_rows"))
    groups.unionByName(merged).orderBy(col("grp"))
  }

  /** Theta-sketch set algebra over two row populations: estimates of
    * |A|, |B|, |A ∪ B|, |A ∩ B|, |A \ B| of `key`'s distinct values,
    * in one pass over the data (two filtered theta aggs) + pure
    * sketch-space set operations. The only sketch family with
    * intersect/difference — HLL can only union.
    */
  def thetaSetOps(df: DataFrame, key: String,
      inA: org.apache.spark.sql.Column, inB: org.apache.spark.sql.Column,
      lgK: Int = 12): DataFrame =
    df.withColumn("__in_a", inA).withColumn("__in_b", inB)
      .agg(
        expr(s"theta_sketch_agg(CASE WHEN __in_a THEN $key END, $lgK)").as("ska"),
        expr(s"theta_sketch_agg(CASE WHEN __in_b THEN $key END, $lgK)").as("skb"))
      .select(
        expr("theta_sketch_estimate(ska)").as("approx_a"),
        expr("theta_sketch_estimate(skb)").as("approx_b"),
        expr("theta_sketch_estimate(theta_union(ska, skb))").as("approx_union"),
        expr("theta_sketch_estimate(theta_intersection(ska, skb))").as("approx_intersect"),
        expr("theta_sketch_estimate(theta_difference(ska, skb))").as("approx_a_minus_b"))

  /** Per-group KLL quantile sketches + merged-from-sketches corpus
    * quantiles: per group p25/p50/p75 from its own sketch, plus the
    * `__all__` row via `kll_merge_agg_double` over the group sketches
    * — again, the rollup touches only sketch state. KLL carries a
    * proven rank-error bound (~1.7% two-sided at k=200), asserted in
    * SketchSpec.
    */
  def kllQuantiles(df: DataFrame, group: String, value: String,
      k: Int = 200): DataFrame = {
    val perGroup = df.groupBy(col(group).as("grp"))
      .agg(expr(s"kll_sketch_agg_double(CAST($value AS DOUBLE), $k)").as("sk"))
      .persist() // same sketch-table pattern as hllRollup
    def qs(skCol: String) = Seq(0.25, 0.5, 0.75).map(q =>
      expr(s"kll_sketch_get_quantile_double($skCol, CAST($q AS DOUBLE))")
        .as(s"p${(q * 100).toInt}"))
    val groups = perGroup.select(col("grp") +: qs("sk"): _*)
    val merged = perGroup.agg(expr(s"kll_merge_agg_double(sk, $k)").as("mk"))
      .select(lit("__all__").as("grp") +: qs("mk"): _*)
    groups.unionByName(merged).orderBy(col("grp"))
  }

  /** Mergeable heavy hitters: `approx_top_k_accumulate` builds one
    * bounded frequency state per batch partition, `approx_top_k_combine`
    * merges the states, `approx_top_k_estimate` reads out the top k —
    * the persist-partial-states-then-combine pattern for streaming /
    * incremental top-k (exact counts while tracked items ≥ distinct
    * keys; graceful approximation beyond).
    */
  def topKCombined(df: DataFrame, batch: String, key: String, k: Int,
      maxTracked: Int = 1024): DataFrame = {
    val states = df.groupBy(col(batch))
      .agg(expr(s"approx_top_k_accumulate($key, $maxTracked)").as("state"))
    states.agg(expr(s"approx_top_k_combine(state, $maxTracked)").as("comb"))
      .select(explode(expr(s"approx_top_k_estimate(comb, $k)")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("approx_count"))
      .orderBy(desc("approx_count"), col("item"))
  }
}
