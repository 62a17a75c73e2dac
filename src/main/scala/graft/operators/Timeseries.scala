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
}
