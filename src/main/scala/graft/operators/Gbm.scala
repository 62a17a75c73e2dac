package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Histogram-based gradient boosting, the way the distributed GBDT
  * engines (LightGBM/XGBoost-hist) actually scale: per-round split
  * finding never touches sorted rows — the fact table partially
  * aggregates into a bounded per-bin histogram (count, Σresidual),
  * the best threshold comes from a cumulative scan of that tiny
  * frame, and the residual update is a map-side broadcast join. One
  * scan + one O(bins) reduce per round at any data size.
  */
object Gbm {

  /** `rounds` depth-1 regression stumps on a pre-binned feature with
    * squared loss and learning rate ½. Residuals start at the raw
    * target (the first stump's leaves absorb the global mean).
    * Returns one row per round: (round, split_bin, leaf_l, leaf_r,
    * gain) — leaves in target units, split is `bin <= split_bin`.
    *
    * Determinism: the target is integer units end-to-end — leaf
    * means use the ties-toward-+∞ integer formula (offset 1e9), the
    * ½ learning rate is floor(leaf/2.0), and residuals stay exact
    * BIGINTs, so every histogram is exact and the gain argmax
    * (gain desc, bin asc) compares identically-derived doubles.
    */
  def histBoost(df: DataFrame, bin: Column, yUnits: Column,
      rounds: Int = 2): DataFrame = {
    val OFF = 1000000000L
    def tieMean(s: Column, n: Column): Column =
      (floor((lit(2L) * (s + lit(OFF) * n) + n) / (lit(2.0) * n)) - lit(OFF)).cast(LongType)
    var rows = df.select(bin.cast(LongType).as("bin"), yUnits.cast(LongType).as("r"))
      .localCheckpoint(true)
    var model: DataFrame = null
    for (m <- 1 to rounds) {
      val hist = rows.groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("r")).as("s"))
      val tot = hist.agg(sum(col("n")).as("tn"), sum(col("s")).as("ts"))
      val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      // the window runs on the O(bins) histogram frame, never the fact table
      val cand = hist
        .withColumn("nl", sum(col("n")).over(wCum))
        .withColumn("sl", sum(col("s")).over(wCum))
        .crossJoin(broadcast(tot))
        .select(col("bin"), col("nl"), col("sl"),
          (col("tn") - col("nl")).as("nr"), (col("ts") - col("sl")).as("sr"))
        .filter(col("nr") > 0)
        .withColumn("gain",
          col("sl").cast(DoubleType) * col("sl").cast(DoubleType) / col("nl").cast(DoubleType) +
            col("sr").cast(DoubleType) * col("sr").cast(DoubleType) / col("nr").cast(DoubleType))
      val best = cand.orderBy(desc("gain"), col("bin")).limit(1)
        .select(col("bin").as("split_bin"), col("gain"),
          tieMean(col("sl"), col("nl")).as("leaf_l"),
          tieMean(col("sr"), col("nr")).as("leaf_r"))
        .localCheckpoint(true) // consumed by the model union AND the residual update
      val row = best.select(lit(m.toLong).as("round"), col("split_bin"),
        col("leaf_l"), col("leaf_r"), col("gain"))
      model = if (model == null) row else model.unionAll(row)
      if (m < rounds)
        rows = rows.crossJoin(broadcast(best))
          .withColumn("r", col("r") -
            when(col("bin") <= col("split_bin"),
              floor(col("leaf_l").cast(DoubleType) / lit(2.0)))
              .otherwise(floor(col("leaf_r").cast(DoubleType) / lit(2.0))))
          .select(col("bin"), col("r"))
          .localCheckpoint(true)
    }
    model.orderBy(col("round"))
  }
}
