package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-evaluation and supervised-encoding operators — the scoring
  * side of a training pipeline (cf. the reference's report endpoints,
  * `server.js:200-219`, which it serves as pre-aggregated JSON; here
  * each metric is a distributed aggregation over the scored fact).
  *
  * Scale shape shared by the family: every metric reduces through ONE
  * partial-aggregated shuffle to an O(distinct-scores) or O(bins) or
  * O(categories) frame; ranks come from the bin+offset pattern (a
  * cumulative window over the COLLAPSED frame), never a row_number
  * over the fact. All rank/probability arithmetic is integer-exact so
  * results are order-independent and oracle-stable.
  */
object Eval {

  /** ROC AUC of a score against a binary label via the tie-corrected
    * rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻), where R⁺ is
    * the midrank sum of positives (the Mann–Whitney U relation — same
    * integer midrank machinery as q94, repackaged as the model-eval
    * metric).
    *
    * Midranks are exact in doubled units: a distinct-score group with
    * `c` rows starting after `off` predecessors has per-row midrank
    * (2·off + c + 1)/2. One partial-agg shuffle collapses the fact to
    * the O(distinct scores) frame; the offset cumsum runs on that
    * collapsed frame (bounded: scores are discretized by the caller —
    * cents, probability units — never raw doubles).
    *
    * `score` must be an exactly-ordered type (integer units or
    * DECIMAL); `label` a boolean.
    */
  def binaryAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val g = df.select(score.as("s"), when(label, 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    // O(distinct) frame: the unpartitioned window is over the collapsed
    // score domain, not the fact
    val wOff = Window.orderBy(col("s")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
    // r2 ≈ 2·n_pos·n silently overflows a LongType sum around n ≈ 1e10
    // rows (the 100 TB scale this targets) — route the product through
    // DECIMAL(38,0), like the other exact-moment families do.
    val dec = DecimalType(38, 0)
    ranked.agg(
        sum(col("p").cast(dec) *
          (lit(2L) * col("off") + col("c") + lit(1L)).cast(dec)).as("r2"),
        sum(col("p")).as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"),
        sum(col("c")).as("n"))
      .select(col("n"), col("n_pos"), col("n_neg"),
        round((col("r2") - col("n_pos").cast(dec) * (col("n_pos") + 1).cast(dec))
            .cast(DoubleType) /
          (lit(2.0) * col("n_pos").cast(DoubleType) * col("n_neg").cast(DoubleType)), 6)
          .as("auc"))
  }

  /** Per-group [[binaryAuc]] — same collapsed-score-domain midrank
    * identity with every window/aggregation partitioned by `group`:
    * the k-fold / per-segment model-eval form ("is the model only good
    * on one slice"). Same DECIMAL(38,0) midrank sums.
    */
  def groupedAuc(df: DataFrame, group: Column, score: Column,
      label: Column): DataFrame = {
    val g = df.select(group.as("grp"), score.as("s"),
        when(label, 1L).otherwise(0L).as("y"))
      .groupBy(col("grp"), col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val wOff = Window.partitionBy(col("grp")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
    val dec = DecimalType(38, 0)
    ranked.groupBy(col("grp"))
      .agg(
        sum(col("p").cast(dec) *
          (lit(2L) * col("off") + col("c") + lit(1L)).cast(dec)).as("r2"),
        sum(col("p")).as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"),
        sum(col("c")).as("n"))
      .select(col("grp"), col("n"), col("n_pos"), col("n_neg"),
        // degenerate-group guard: a one-class group has no ROC (and
        // ANSI throws on the zero divisor)
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("r2") - col("n_pos").cast(dec) * (col("n_pos") + 1).cast(dec))
              .cast(DoubleType) /
            (lit(2.0) * col("n_pos").cast(DoubleType) * col("n_neg").cast(DoubleType)), 6))
          .as("auc"))
  }

  /** Reliability diagram + per-bin Brier decomposition for a predicted
    * probability expressed in exact millionths (`pU` ∈ [0, 1e6] as a
    * LONG — the caller scales however it scores; integer units keep
    * bin edges and squared errors bit-identical across engines).
    *
    * Per uniform bin: count, mean predicted probability, observed
    * positive rate, and the bin's Brier contribution mean((p−y)²) —
    * computed as integer (pU − y·1e6)² sums in 1e12 units. ONE
    * partial-agg shuffle to an O(bins) frame.
    */
  def calibration(df: DataFrame, pU: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val scored = df.select(pU.cast(LongType).as("p_u"),
      when(label, 1L).otherwise(0L).as("y"))
    scored
      .withColumn("bin", expr(s"(p_u * $bins) div 1000001").cast(LongType))
      .withColumn("se_u", (col("p_u") - col("y") * lit(1000000L)) *
        (col("p_u") - col("y") * lit(1000000L)))
      .groupBy(col("bin"))
      // se_u is up to 1e12 per row — a LongType sum overflows around
      // 9e6 rows per bin; DECIMAL(38,0) like binaryAuc's midrank sum
      .agg(count(lit(1)).as("n"), sum(col("p_u")).as("sp"),
        sum(col("y")).as("n_pos"),
        sum(col("se_u").cast(DecimalType(38, 0))).as("sse"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("sp").cast(DoubleType) / col("n").cast(DoubleType) / 1.0e6, 6)
          .as("mean_pred"),
        round(col("n_pos").cast(DoubleType) / col("n").cast(DoubleType), 6)
          .as("pos_rate"),
        round(col("sse").cast(DoubleType) / col("n").cast(DoubleType) / 1.0e12, 6)
          .as("brier"))
      .orderBy(col("bin"))
  }

  /** Weight of evidence + information value of a CATEGORICAL feature
    * against a binary label (the credit-scoring / feature-audit
    * standard). Laplace 0.5 smoothing on both event counts so
    * observed-zero cells stay finite; WOE = ln(((p+½)/P)/((q+½)/Q)),
    * IV contribution = (p/P − q/Q)·WOE.
    *
    * ONE partial-agg shuffle to the O(categories) frame; totals ride a
    * broadcast 1-row frame.
    */
  def woeIv(df: DataFrame, category: Column, label: Column): DataFrame = {
    val cells = df.select(category.as("cat"),
        when(label, 1L).otherwise(0L).as("y"))
      .groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    val tot = cells.agg(sum(col("n_pos")).as("tp"),
      sum(col("n") - col("n_pos")).as("tn"))
    val p = col("n_pos").cast(DoubleType)
    val q = (col("n") - col("n_pos")).cast(DoubleType)
    val woe = log(((p + 0.5) / col("tp").cast(DoubleType)) /
      ((q + 0.5) / col("tn").cast(DoubleType)))
    cells.crossJoin(broadcast(tot))
      .select(col("cat"), col("n"), col("n_pos"),
        round(woe, 6).as("woe"),
        round((p / col("tp").cast(DoubleType) - q / col("tn").cast(DoubleType)) * woe, 6)
          .as("iv_contrib"))
      .orderBy(col("cat"))
  }

  /** Leave-one-out target encoding of a categorical key against a
    * binary target with additive smoothing toward the global prior:
    * enc(i) = (posᵍ − yᵢ + m·prior) / (nᵍ − 1 + m). The leakage-safe
    * encoder a feature pipeline ships (plain group-mean encoding leaks
    * the row's own label).
    *
    * All arithmetic in exact millionths with integer floor division —
    * the group frame is O(categories), broadcast back onto the fact;
    * ONE partial-agg shuffle total. `m` is the smoothing pseudo-count.
    */
  def targetEncodeLoo(df: DataFrame, key: Column, label: Column,
      m: Int = 10): DataFrame = {
    require(m >= 1, s"smoothing pseudo-count must be >= 1 (LOO of a " +
      s"singleton group divides by zero at m=0): $m")
    val base = df.withColumn("__k", key)
      .withColumn("__y", when(label, 1L).otherwise(0L))
    val grp = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("gn"), sum(col("__y")).as("gp"))
    // exact integer floor division throughout (a long `/` routes
    // through double and can land on the wrong millionth)
    val prior = grp.agg(sum(col("gp")).as("tp"), sum(col("gn")).as("tn"))
      .select(expr("(tp * 1000000L) div tn").as("prior_u"))
    base
      .join(broadcast(grp), Seq("__k"))
      .crossJoin(broadcast(prior))
      .withColumn("enc_u", expr(
        s"((gp - __y) * 1000000L + ${m}L * prior_u) div (gn - 1 + ${m}L)"))
      .drop("__k")
  }
}
