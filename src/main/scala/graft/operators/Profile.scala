package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling report: per-column null counts, distinct counts and
  * min/max, in ONE pass over the data.
  *
  * The reference's quality gate counts rejects per rule
  * (server.js:65-97, re-expressed in Clean.qualityReport); profiling
  * is the other half of that coin — what the data looks like before
  * rules are written. The key shape constraint at scale: ALL columns'
  * statistics ride in a single aggregate projection (one job, one
  * scan), never a loop of per-column jobs, and the long-format pivot
  * happens on the one-row result (O(columns), driver-free).
  */
object Profile {

  /** One row per profiled column: (column_name, n_rows, n_nulls,
    * n_distinct, min_val, max_val) — min/max as canonical strings so
    * heterogeneous column types share one schema. `exact` distinct
    * (the oracle-matched form) shuffles per-column distincts; the
    * default HLL form is one pass, no distinct expansion — the 100 TB
    * setting.
    */
  def describe(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__dist_$c"),
        // min/max on the NATIVE type (numeric order), stringified after
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // stack the single row to long format: stack(k, name1, v1a, ..., nameK, ...)
    val stackArgs = cols.map { c =>
      s"'$c', __n, __nulls_$c, __dist_$c, __min_$c, __max_$c"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_rows, n_nulls, n_distinct, min_val, max_val)"))
  }
}
