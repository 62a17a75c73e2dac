package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * API levels: `hllSketches` / `kllSketches` build the per-group
  * sketch TABLE — at scale that frame is the incremental artifact you
  * persist or write and later re-merge, and its caching lifecycle is
  * the CALLER's (persist/unpersist or write/read). `hllRollupFrom` /
  * `kllQuantilesFrom` read out of such a table. The one-shot
  * `hllRollup` / `kllQuantiles` conveniences manage the cache
  * internally: they persist the sketch frame, EAGERLY materialize the
  * O(groups) result (localCheckpoint), and unpersist before returning
  * — no cached relation outlives the call.
  */
object Sketches {

  /** ONE bloom-filter sketch of `df[key]` as a 1-row binary frame —
    * the mergeable MEMBERSHIP sketch beside HLL (counts) / KLL
    * (quantiles) / CMS (frequencies) / theta (set algebra). Map-side
    * partials are fixed-size bit arrays OR-merged at combine, so the
    * build shuffles O(partitions · numBits/8) bytes regardless of
    * build-side row count; the sketch persists/broadcasts as ordinary
    * binary data and probes from any session — the portable sibling
    * of the planner's internal runtime bloom join filter.
    */
  def bloomFilter(df: DataFrame, key: String,
      numBits: Int = 1 << 18, numHashes: Int = 6): DataFrame =
    df.agg(graft.functions.vector.bloomAgg(col(key).cast("long"), numBits, numHashes)
      .as("bloom"))

  /** Bloom pre-filter census: probe `probe[probeKey]` against a bloom
    * of `build[buildKey]` and report pass counts vs exact membership —
    * n_probe / n_pass / n_member / n_false_pass / observed fpr. At
    * 100 TB this is the audit that sizes a bloom pre-filter before a
    * shuffly semi join: the probe is one broadcast 1-row crossJoin +
    * a codegen'd bit test per fact row.
    */
  def bloomJoinCensus(build: DataFrame, buildKey: String,
      probe: DataFrame, probeKey: String,
      numBits: Int = 1 << 18, numHashes: Int = 6): DataFrame = {
    val sk = bloomFilter(build, buildKey, numBits, numHashes)
    // exact-membership side: NO broadcast hint — the census is only
    // meaningful when the build side is big enough to justify a bloom
    // pre-filter, at which point a forced broadcast of its distinct
    // key set would OOM the driver; let the planner (AQE) pick
    // broadcast only when the key set actually fits.
    val members = build.select(col(buildKey).cast("long").as("__bk")).distinct()
      .withColumn("__member", lit(true))
    probe.select(col(probeKey).cast("long").as("__pk"))
      .join(members, col("__pk") === col("__bk"), "left")
      .crossJoin(broadcast(sk))
      .select(col("__pk"),
        coalesce(col("__member"), lit(false)).as("m"),
        graft.functions.vector.bloomMightContain(col("bloom"), col("__pk")).as("p"))
      .agg(count(lit(1)).as("n_probe"),
        sum(when(col("p"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_member"),
        sum(when(col("p") && !col("m"), 1L).otherwise(0L)).as("n_false_pass"),
        sum(when(!col("p") && col("m"), 1L).otherwise(0L)).as("n_false_negative"))
      .withColumn("fpr", round(col("n_false_pass").cast("double") /
        greatest(col("n_probe") - col("n_member"), lit(1L)).cast("double"), 6))
  }

  /** Backtick-quote an identifier for splicing into SQL text (column
    * names with spaces/dots/hyphens would otherwise fail to parse or
    * resolve as nested-field paths).
    */
  private[graft] def qid(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Per-group HLL sketch table: one ~2.5 KB binary + row count per
    * group. Unpersisted — the caller owns the lifecycle (persist for
    * a multi-consumer readout, or write it out as the incremental
    * sketch store).
    */
  def hllSketches(df: DataFrame, group: String, key: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(group).as("grp"))
      .agg(expr(s"hll_sketch_agg(${qid(key)}, $lgK)").as("sk"),
        count(lit(1)).as("n_rows"))

  /** Readout over a sketch table from [[hllSketches]]: per-group
    * estimates plus an `__all__` row whose estimate comes from
    * `hll_union_agg` over the GROUP SKETCHES — the re-aggregation
    * never rescans the data.
    */
  def hllRollupFrom(perGroup: DataFrame): DataFrame = {
    val groups = perGroup.select(col("grp"),
      expr("hll_sketch_estimate(sk)").as("approx_distinct"), col("n_rows"))
    val merged = perGroup.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_distinct"),
      sum(col("n_rows")).as("n_rows"))
      .select(lit("__all__").as("grp"), col("approx_distinct"), col("n_rows"))
    groups.unionByName(merged).orderBy(col("grp"))
  }

  /** One-shot convenience: build sketches, read out per-group + merged
    * rows, and release the internal cache before returning (the result
    * is materialized eagerly — O(groups) rows — so nothing recomputes
    * and no cached relation leaks into the caller's session).
    */
  def hllRollup(df: DataFrame, group: String, key: String,
      lgK: Int = 12): DataFrame = {
    val perGroup = hllSketches(df, group, key, lgK).persist()
    try hllRollupFrom(perGroup).localCheckpoint(true)
    finally perGroup.unpersist(false)
  }

  /** Theta-sketch set algebra over two row populations: estimates of
    * |A|, |B|, |A ∪ B|, |A ∩ B|, |A \ B| of `key`'s distinct values,
    * in one pass over the data (two filtered theta aggs) + pure
    * sketch-space set operations. The only sketch family with
    * intersect/difference — HLL can only union.
    */
  /** Sliding-window distinct counts from MERGEABLE per-unit sketches:
    * build one HLL sketch per (unit) — e.g. per day — then each
    * window-end merges only its ≤ `width` unit sketches via
    * `hll_union_agg`. This is the 100 TB form of a rolling COUNT
    * DISTINCT: the raw-data pass happens ONCE (per-unit partial agg);
    * windows reuse sketch bytes instead of rescanning rows, and wider
    * windows cost nothing extra. The exact twin (linear window-end
    * expansion of the deduped (unit, key) frame) is
    * `q82_rolling_distinct`; SketchSpec pins the approximation error
    * against it.
    *
    * `units` must be consecutive integers (e.g. epoch days); each
    * unit's sketch is replicated map-side to the `width` window-ends
    * it participates in, and window-ends not present in the data are
    * dropped by the inner join with the distinct unit frame.
    */
  def rollingDistinct(df: DataFrame, unit: String, key: String,
      width: Int, lgK: Int = 12): DataFrame = {
    require(width >= 1, s"width must be >= 1: $width")
    val perUnit = df.groupBy(col(unit).as("u"))
      .agg(expr(s"hll_sketch_agg(${qid(key)}, $lgK)").as("sk"))
    val units = perUnit.select(col("u").as("wend"))
    perUnit
      .select(explode(sequence(col("u"), col("u") + (width - 1))).as("wend"), col("sk"))
      .join(broadcast(units), "wend")
      .groupBy(col("wend"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_distinct"))
      .orderBy(col("wend"))
  }

  /** HLL set-cardinality estimates via inclusion–exclusion: |A|, |B|,
    * and |A ∪ B| straight from sketch space (HLL unions losslessly),
    * |A ∩ B| = |A| + |B| − |A ∪ B| clamped at 0. HLL cannot intersect
    * in sketch space (theta can — [[thetaSetOps]] is the exact-algebra
    * path); inclusion–exclusion is the standard workaround when only
    * HLL state exists (e.g. pre-aggregated per-segment sketches from a
    * metrics store), and its RELATIVE error grows as |A∪B|/|A∩B| —
    * each estimate's absolute error scales with its own set's size,
    * and the subtraction concentrates all three errors onto the
    * (smaller) intersection. SketchSpec pins the bound.
    */
  def hllSetEstimates(df: DataFrame, key: String,
      inA: Column, inB: Column, lgK: Int = 12): DataFrame =
    df.withColumn("__in_a", inA).withColumn("__in_b", inB)
      .agg(
        expr(s"hll_sketch_agg(CASE WHEN __in_a THEN ${qid(key)} END, $lgK)").as("ska"),
        expr(s"hll_sketch_agg(CASE WHEN __in_b THEN ${qid(key)} END, $lgK)").as("skb"))
      .select(
        expr("hll_sketch_estimate(ska)").as("approx_a"),
        expr("hll_sketch_estimate(skb)").as("approx_b"),
        expr("hll_sketch_estimate(hll_union(ska, skb))").as("approx_union"))
      .withColumn("approx_intersect_ie",
        greatest(col("approx_a") + col("approx_b") - col("approx_union"), lit(0L)))

  /** VarOpt weighted-sample readout: ONE mergeable k-item weighted
    * sample of (`item`, `weight`) (graft's `varopt_agg` — the
    * SAMPLING member of the sketch family), then each class's weight
    * sum estimated from the sample's inclusion-adjusted weights
    * beside the exact answer. The 100 TB serving shape: the fact scan
    * happens once to build an O(k) sketch; ANY later segment question
    * is a broadcast join of the k sample rows against the dimension —
    * no second fact pass (here the exact twin runs only to report the
    * estimation error). Σ adjusted weights over ALL samples equals
    * the exact total by the VarOpt invariant; per-class sums are
    * unbiased with near-optimal variance.
    */
  def varoptShares(df: DataFrame, item: String, weight: String, cls: String,
      k: Int): DataFrame = {
    // the sketch silently skips non-positive weights (they can never
    // be sampled) — drop them from the exact side too, or a class of
    // zero-weight rows would report an unreachable exact total (and a
    // 0 denominator → NaN rel_err)
    val base = df.select(col(item).as("it"),
      col(weight).cast("double").as("w"), col(cls).as("cls"))
      .filter(col("w") > 0.0).persist()
    try {
      val sk = base.agg(graft.functions.vector.varoptAgg(col("it"), col("w"), k).as("sk"))
      val samples = sk.select(explode(graft.functions.vector.varoptSamples(col("sk"))).as("s"))
        .select(col("s.item").as("it"), col("s.weight").as("sw"))
      // ONE canonical class per item (deterministic max tie-break):
      // an item listed under two classes would otherwise credit its
      // sampled weight to BOTH, breaking the exact-total invariant.
      // The exact side aggregates under the SAME canonical mapping so
      // the two columns stay comparable.
      val classOf = base.groupBy(col("it")).agg(max(col("cls")).as("cls"))
      val est = classOf
        .join(broadcast(samples), "it")
        .groupBy(col("cls"))
        .agg(sum(col("sw")).as("est_weight"), count(lit(1)).as("n_sampled"))
      val exact = base.drop("cls").join(classOf, "it")
        .groupBy(col("cls")).agg(sum(col("w")).as("exact_weight"))
      exact.join(est, Seq("cls"), "left")
        .select(col("cls"), round(col("exact_weight"), 2).as("exact_weight"),
          round(coalesce(col("est_weight"), lit(0.0)), 2).as("est_weight"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          round(abs(coalesce(col("est_weight"), lit(0.0)) - col("exact_weight")) /
            col("exact_weight"), 4).as("rel_err"))
        .orderBy(col("cls"))
        .localCheckpoint(true)
    } finally base.unpersist(false)
  }

  def thetaSetOps(df: DataFrame, key: String,
      inA: Column, inB: Column, lgK: Int = 12): DataFrame =
    df.withColumn("__in_a", inA).withColumn("__in_b", inB)
      .agg(
        expr(s"theta_sketch_agg(CASE WHEN __in_a THEN ${qid(key)} END, $lgK)").as("ska"),
        expr(s"theta_sketch_agg(CASE WHEN __in_b THEN ${qid(key)} END, $lgK)").as("skb"))
      .select(
        expr("theta_sketch_estimate(ska)").as("approx_a"),
        expr("theta_sketch_estimate(skb)").as("approx_b"),
        expr("theta_sketch_estimate(theta_union(ska, skb))").as("approx_union"),
        expr("theta_sketch_estimate(theta_intersection(ska, skb))").as("approx_intersect"),
        expr("theta_sketch_estimate(theta_difference(ska, skb))").as("approx_a_minus_b"))

  /** Per-group KLL quantile sketch table (caller-owned lifecycle, see
    * [[hllSketches]]).
    */
  def kllSketches(df: DataFrame, group: String, value: String,
      k: Int = 200): DataFrame =
    df.groupBy(col(group).as("grp"))
      .agg(expr(s"kll_sketch_agg_double(CAST(${qid(value)} AS DOUBLE), $k)").as("sk"))

  /** Readout over a sketch table from [[kllSketches]]: per-group
    * p25/p50/p75 plus the `__all__` row via `kll_merge_agg_double`
    * over the group sketches — the rollup touches only sketch state.
    * KLL carries a proven rank-error bound (~1.7% two-sided at
    * k=200), asserted in SketchSpec.
    */
  def kllQuantilesFrom(perGroup: DataFrame, k: Int = 200): DataFrame = {
    def qs(skCol: String) = Seq(0.25, 0.5, 0.75).map(q =>
      expr(s"kll_sketch_get_quantile_double($skCol, CAST($q AS DOUBLE))")
        .as(s"p${(q * 100).toInt}"))
    val groups = perGroup.select(col("grp") +: qs("sk"): _*)
    val merged = perGroup.agg(expr(s"kll_merge_agg_double(sk, $k)").as("mk"))
      .select(lit("__all__").as("grp") +: qs("mk"): _*)
    groups.unionByName(merged).orderBy(col("grp"))
  }

  /** One-shot convenience with deterministic cache release (see
    * [[hllRollup]]).
    */
  def kllQuantiles(df: DataFrame, group: String, value: String,
      k: Int = 200): DataFrame = {
    val perGroup = kllSketches(df, group, value, k).persist()
    try kllQuantilesFrom(perGroup, k).localCheckpoint(true)
    finally perGroup.unpersist(false)
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
      .agg(expr(s"approx_top_k_accumulate(${qid(key)}, $maxTracked)").as("state"))
    states.agg(expr(s"approx_top_k_combine(state, $maxTracked)").as("comb"))
      .select(explode(expr(s"approx_top_k_estimate(comb, $k)")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("approx_count"))
      .orderBy(desc("approx_count"), col("item"))
  }
}
