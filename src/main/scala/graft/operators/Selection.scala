package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed EXACT selection (per-group order statistics /
  * interpolated quantiles) via two-pass bin-then-refine.
  *
  * The naive exact form — `row_number()` over a window partitioned by
  * the group — sorts the ENTIRE fact table into O(groups) partitions:
  * with 3 groups at 100 TB that is three tasks each sorting tens of
  * TB. This operator never sorts the fact:
  *
  *  1. Pass 0 (O(groups·cols) shuffle): per-(group, column)
  *     min/max/count.
  *  2. Pass 1 (O(groups·cols·bins) shuffle): per-(group, column, bin)
  *     counts over fixed-width bins — a PARTIAL (map-side)
  *     aggregation, so the shuffle carries bin counts, not rows.
  *  3. On the tiny aggregated frame: cumulative counts locate, for
  *     each target rank, the bin containing it and the rank within
  *     that bin.
  *  4. Pass 2: rescan ONLY rows falling in target bins (broadcast
  *     semi join — map-side filter) and rank within (group, column,
  *     bin); each bin holds ~n/bins of the group, so no sort ever
  *     sees more than a sliver. For pathological value skew (most of
  *     a group in one bin) the refine bound degrades toward n, but
  *     real distributions land ~n/bins; raise `bins` to tighten.
  *
  * Multiple value columns share the three passes (the long-form
  * explode is map-side): quantiles over k columns cost the same scans
  * as one column, not k× — use [[exactQuantilesMulti]] when a query
  * needs several columns' quantiles (q13 needs two).
  *
  * Interpolation matches SQL `quantile_cont` / `percentile_cont`:
  * idx = p·(n−1), result = v_lo + (v_hi − v_lo)·(idx − ⌊idx⌋) over
  * the order statistics at ⌊idx⌋+1 and ⌈idx⌉+1. Nulls are ignored,
  * as in the SQL aggregate. Groups where min = max short-circuit to
  * that value (no second pass for all-identical groups).
  */
object Selection {

  /** One value column: returns one row per (group, p) as
    * `(group, p, q)`.
    */
  def exactQuantiles(df: DataFrame, group: String, value: String,
      ps: Seq[Double], bins: Int = 1024,
      materialize: Boolean = true): DataFrame =
    exactQuantilesMulti(df, group, Seq(value -> ps), bins, materialize).drop("vcol")

  /** Several value columns in one set of passes: returns one row per
    * (group, column, p) as `(group, vcol, p, q)`.
    *
    * `materialize` (default on) eagerly checkpoints the two tiny
    * metadata frames (per-group stats, located cut points): each is
    * consumed by several downstream broadcasts, and without the cut
    * every broadcast re-evaluates the whole counting subtree — the
    * fact would be scanned ~6× instead of 3×. Pass false only to
    * inspect the full declarative plan (PlanSpec does).
    */
  def exactQuantilesMulti(df: DataFrame, group: String,
      specs: Seq[(String, Seq[Double])], bins: Int = 1024,
      materialize: Boolean = true): DataFrame = {
    require(specs.nonEmpty, "need at least one (column, ps) spec")
    specs.foreach { case (c, ps) =>
      require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
        s"quantile probabilities for $c must be in [0,1]: $ps")
    }
    require(bins >= 2, s"need at least 2 bins: $bins")

    // Long form (map-side explode): one (group, vcol, v) row per value.
    val base = df
      .select(col(group) +: specs.map { case (c, _) => col(c).cast(DoubleType).as(c) }: _*)
      .select(col(group), explode(array(specs.map { case (c, _) =>
        struct(lit(c).as("vcol"), col(c).as("v")) }: _*)).as("cv"))
      .select(col(group), col("cv.vcol").as("vcol"), col("cv.v").as("v"))
      .filter(col("v").isNotNull)
    val keys = Seq(col(group), col("vcol"))

    // Pass 0: per-(group, column) bounds + count. O(groups·cols) rows
    // — checkpointed so the binning broadcast, the targets, and the
    // degenerate branch all read it without re-scanning the fact.
    val stats0 = base.groupBy(keys: _*)
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"), count(lit(1)).as("n"))
    val stats = if (materialize) stats0.localCheckpoint(true) else stats0

    // literal (vcol, p) targets frame, exploded map-side from stats
    val psLit = array(specs.flatMap { case (c, ps) =>
      ps.map(p => struct(lit(c).as("vcol"), lit(p).as("p"))) }: _*)

    // All-identical groups need no refinement: every quantile is mn.
    val degenerate = stats.filter(col("mx") === col("mn"))
      .select(col(group), col("vcol"), explode(psLit).as("pp"), col("mn").as("q"))
      .filter(col("pp.vcol") === col("vcol"))
      .select(col(group), col("vcol"), col("pp.p").as("p"), col("q"))
    val live = stats.filter(col("mx") =!= col("mn"))

    // Pass 1: fixed-width binning (map-side broadcast join + partial agg).
    val width = (col("mx") - col("mn")) / bins
    val binned = base.join(broadcast(live), Seq(group, "vcol"))
      .withColumn("bin",
        least(floor((col("v") - col("mn")) / width), lit((bins - 1).toLong)).cast(LongType))
    val counts = binned.groupBy(keys :+ col("bin"): _*).agg(count(lit(1)).as("c"))

    // Cumulative bin counts — O(groups·cols·bins) frame, window fine here.
    val cum = counts
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(keys: _*).orderBy("bin")))
      .withColumn("cum_before", col("cum") - col("c"))

    // Target order-statistic ranks per (group, column, p).
    val targets = live
      .select(col(group), col("vcol"), col("n"), explode(psLit).as("pp"))
      .filter(col("pp.vcol") === col("vcol"))
      .withColumn("p", col("pp.p"))
      .withColumn("idx", col("p") * (col("n") - 1).cast(DoubleType))
      .withColumn("frac", col("idx") - floor(col("idx")).cast(DoubleType))
      .select(col(group), col("vcol"), col("p"), col("frac"),
        explode(array(
          struct(lit("lo").as("which"), (floor(col("idx")) + 1L).cast(LongType).as("r")),
          struct(lit("hi").as("which"), (ceil(col("idx")) + 1L).cast(LongType).as("r")))).as("t"))
      .select(col(group), col("vcol"), col("p"), col("frac"),
        col("t.which").as("which"), col("t.r").as("r"))

    // Locate each rank's bin and within-bin offset (small × small).
    // O(groups·cols·ps) rows — checkpointed so the `needed` and
    // `located` broadcasts below don't each re-run the counting pass.
    val located0 = targets.join(cum, Seq(group, "vcol"))
      .filter(col("r") > col("cum_before") && col("r") <= col("cum"))
      .select(col(group), col("vcol"), col("p"), col("frac"), col("which"),
        col("bin"), (col("r") - col("cum_before")).as("rb"))
    val located = if (materialize) located0.localCheckpoint(true) else located0

    // Pass 2: only target-bin rows rank; (group, column, bin)
    // partitions keep every sort local to a sliver.
    val needed = located.select(col(group), col("vcol"), col("bin")).distinct()
    val inBins = binned.join(broadcast(needed), Seq(group, "vcol", "bin"), "left_semi")
      .withColumn("rb", row_number().over(
        Window.partitionBy(keys :+ col("bin"): _*).orderBy(col("v"))).cast(LongType))
    val refined = inBins.join(broadcast(located), Seq(group, "vcol", "bin", "rb"))
      .groupBy(col(group), col("vcol"), col("p"), col("frac"))
      .agg(max(when(col("which") === "lo", col("v"))).as("lo_v"),
        max(when(col("which") === "hi", col("v"))).as("hi_v"))
      .select(col(group), col("vcol"), col("p"),
        (col("lo_v") + (col("hi_v") - col("lo_v")) * col("frac")).as("q"))

    refined.unionByName(degenerate)
  }
}
