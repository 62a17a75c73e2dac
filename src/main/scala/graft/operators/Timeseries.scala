package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: expand an aggregated (key, bucket)
  * series onto the full calendar spine — every key × every step in
  * [min, max] — with zero-fill and forward-fill (gap filling /
  * "densification", the step most reporting stacks bolt on after the
  * aggregation).
  *
  * Scale shape: the spine is generated MAP-SIDE from a broadcast
  * 1-row bounds frame (`sequence` + `explode` — never a stored
  * calendar table), sized O(keys × steps) — independent of the fact
  * row count. The aggregated series (already O(keys × steps) at most)
  * broadcasts into the spine join when small; forward-fill windows
  * partition by the series key, so state is one running value per
  * key, parallel across keys.
  */
object Timeseries {

  /** Densify `series` (one row per (key, bucket); `bucket` a
    * truncated timestamp) to the full [min, max] spine at `step`.
    * `zeroFill` columns get 0 on missing buckets; `ffill` columns get
    * the last observed value carried forward (0.0 before the first
    * observation) as `ffill_<col>`.
    */
  def densify(series: DataFrame, key: String, bucket: String,
      step: String, zeroFill: Seq[String], ffill: Seq[String]): DataFrame = {
    val bounds = series.agg(min(col(bucket)).as("__b0"), max(col(bucket)).as("__b1"))
    val keys = series.select(col(key)).distinct()
    val spine = keys.crossJoin(broadcast(bounds))
      .select(col(key),
        explode(sequence(col("__b0"), col("__b1"), expr(s"interval $step"))).as(bucket))
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = spine.join(series, Seq(key, bucket), "left")
    val filled = ffill.foldLeft(joined) { (df, c) =>
      df.withColumn(s"ffill_$c", coalesce(last(col(c), ignoreNulls = true).over(w), lit(0.0)))
    }
    zeroFill.foldLeft(filled) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0L)))
    }
  }

  /** Kleinberg 2-state burst detection (Kleinberg 2002, "Bursty and
    * Hierarchical Structure in Streams"): per key, the inter-event
    * gaps xᵢ are modeled by a base state with rate λ₀ = n/T and a
    * burst state with rate λ₁ = s·λ₀; emitting gap x in state j costs
    * λⱼ·x − ln λⱼ (the exponential's negative log-likelihood), and
    * entering the burst state costs γ·ln n. The minimum-cost state
    * sequence comes from a Viterbi FORWARD pass expressed as one HOF
    * fold over the gap array — the fold state carries, for each of
    * the two states, the best-path cost AND the number of burst steps
    * on that best path (so no backtracking pass is needed; tie rules
    * are pinned: equal costs prefer the non-burst predecessor and
    * staying in the burst state, making the output deterministic).
    *
    * Returns one row per qualifying key: (key, n_events, n_gaps,
    * burst_steps, burst_frac, viterbi_cost). No oracle — ln over a
    * recursion is not bit-reproducible across engines — correctness
    * is pinned by TimeseriesSpec's exact driver-side Viterbi replay
    * and a planted-burst detection case.
    *
    * Scale shape: one partial-agg shuffle collapses events to the
    * O(keys) array frame (per-key arrays bounded by per-entity event
    * counts — the sessionization contract); the fold is map-side.
    */
  def kleinbergBursts(events: DataFrame, key: String, ts: String,
      s: Double = 2.0, gamma: Double = 1.0, minEvents: Int = 10): DataFrame = {
    val arr = events
      .select(col(key).as("k"), unix_micros(col(ts)).as("tu"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(col("tu"))).as("ta"))
      .filter(size(col("ta")) > minEvents)
    val m = size(col("ta")) - 1 // gap count
    val gaps = zip_with(
      slice(col("ta"), lit(2), m), slice(col("ta"), lit(1), m),
      (a, b) => (a - b).cast("double") / 1.0e6)
    val withGaps = arr.withColumn("gaps", gaps)
      .withColumn("t_total", aggregate(col("gaps"), lit(0.0), (acc, x) => acc + x))
      .filter(col("t_total") > 0.0)
      .withColumn("lam0", size(col("gaps")).cast("double") / col("t_total"))
      .withColumn("lam1", col("lam0") * lit(s))
      .withColumn("gln", lit(gamma) * log(size(col("gaps")).cast("double")))
    val st = aggregate(col("gaps"),
      struct(lit(0.0).as("c0"), lit(1.0e18).as("c1"),
        lit(0L).as("b0"), lit(0L).as("b1")),
      (acc, x) => {
        val cost0 = col("lam0") * x - log(col("lam0"))
        val cost1 = col("lam1") * x - log(col("lam1"))
        val enter = acc.getField("c0") + col("gln")
        val c0n = least(acc.getField("c0"), acc.getField("c1")) + cost0
        val b0n = when(acc.getField("c0") <= acc.getField("c1"),
          acc.getField("b0")).otherwise(acc.getField("b1"))
        val c1n = least(enter, acc.getField("c1")) + cost1
        val b1n = when(acc.getField("c1") <= enter,
          acc.getField("b1")).otherwise(acc.getField("b0")) + lit(1L)
        struct(c0n.as("c0"), c1n.as("c1"), b0n.as("b0"), b1n.as("b1"))
      })
    withGaps.withColumn("st", st)
      .select(col("k").as(key),
        (size(col("gaps")) + 1).cast("long").as("n_events"),
        size(col("gaps")).cast("long").as("n_gaps"),
        when(col("st.c0") <= col("st.c1"), col("st.b0")).otherwise(col("st.b1"))
          .as("burst_steps"),
        round(
          when(col("st.c0") <= col("st.c1"), col("st.b0")).otherwise(col("st.b1"))
            .cast("double") / size(col("gaps")).cast("double"), 6).as("burst_frac"),
        round(least(col("st.c0"), col("st.c1")), 6).as("viterbi_cost"))
      .orderBy(col(key))
  }
}
