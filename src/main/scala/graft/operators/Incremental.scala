package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental aggregate maintenance (incremental materialized view).
  *
  * The 100 TB form of the reference's cron-refreshed summary report
  * (server.js:200-219, 264): instead of rescanning the full history
  * every refresh, keep the aggregate's PARTIAL state (per-key
  * mergeable moments) as a table, fold only the new batch's partials
  * into it, and finalize views from the state — the same
  * partial/merge/finalize contract Spark's own AggregateFunction
  * uses, lifted to table granularity. A daily refresh then costs
  * O(new partition), not O(history); the state table is O(keys).
  *
  * All mergeable measures: count, decimal sum (order-independent
  * exact arithmetic), min, max. Derived measures (avg) are computed
  * only at finalize time, never stored — finalize(merge(a,b)) ≡
  * finalize(partials(a ∪ b)) is the associativity contract
  * IncrementalSpec asserts, and the DuckDB oracle checks end-to-end
  * (state ⊕ delta must equal the plain GROUP BY over the union).
  */
object Incremental {
  private val D = DecimalType(18, 2)

  /** Per-key mergeable partial state for one batch: count / exact
    * decimal sum / min / max of `value`. One partial-agg shuffle.
    */
  def partials(df: DataFrame, key: String, value: Column): DataFrame = {
    val v = value.cast(D)
    df.groupBy(col(key))
      .agg(count(v).as("pcnt"), sum(v).as("psum"),
        min(v).as("pmin"), max(v).as("pmax"))
  }

  /** Fold a new batch's partials into the state: union + re-aggregate
    * by key. Every measure is mergeable, so map-side partial
    * aggregation collapses both inputs before the O(keys) shuffle.
    */
  def merge(state: DataFrame, delta: DataFrame, key: String): DataFrame =
    state.unionByName(delta)
      .groupBy(col(key))
      .agg(sum(col("pcnt")).as("pcnt"), sum(col("psum")).as("psum"),
        min(col("pmin")).as("pmin"), max(col("pmax")).as("pmax"))

  /** Serve the user-facing view from the state table: derived
    * measures (avg) appear here only. Pure projection — no shuffle.
    */
  def finalizeView(state: DataFrame, key: String): DataFrame =
    state.select(col(key),
      col("pcnt").cast(LongType).as("n"),
      col("psum").cast(DoubleType).as("total"),
      round(col("psum").cast(DoubleType) / col("pcnt").cast(DoubleType), 6).as("avg"),
      col("pmin").cast(DoubleType).as("vmin"),
      col("pmax").cast(DoubleType).as("vmax"))
}
