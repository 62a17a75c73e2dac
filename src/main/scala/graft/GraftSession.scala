package graft

import org.apache.spark.sql.SparkSession

/** Session-build-time configuration for a graft session. All confs the
  * library depends on are set HERE, once, at session construction —
  * never mutated per-operator (hidden global state would make operator
  * behavior depend on call order).
  */
object GraftSession {

  /** Confs every graft session needs:
    *
    *   - `spark.sql.extensions`: registers the native `vec_dot` /
    *     `vec_cosine` / `top_k_by` functions.
    *   - UTC session timezone: oracle parity (SURVEY.md §6).
    *   - `nanosAsLong`: the events table carries TIMESTAMP(NANOS),
    *     which the vectorized parquet reader otherwise rejects;
    *     [[Tables]] rebuilds the proper micros timestamp from the raw
    *     long. Must be set before the first read — hence here.
    */
  val required: Map[String, String] = Map(
    "spark.sql.extensions"                  -> "graft.functions.GraftExtensions",
    "spark.sql.session.timeZone"            -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong"  -> "true")

  /** `spark.graft.localSpread` — LOCAL-ONLY workaround, default off.
    *
    * The local test parquet files are single-row-group, so a scan is
    * one task no matter how `maxPartitionBytes` is set; every per-row
    * operator would serialize on one core. When this flag is true,
    * [[Tables]] hash-repartitions each non-tiny table on its primary
    * join/group key ONCE per session (memoized + persisted), restoring
    * parallelism without paying a full-table exchange per query.
    *
    * On a cluster this MUST stay off (the default): the input is
    * thousands of splittable files, and an unconditional load-path
    * repartition would full-shuffle the dataset before any query logic.
    */
  val LocalSpreadKey = "spark.graft.localSpread"

  def localSpread(spark: SparkSession): Boolean =
    spark.conf.get(LocalSpreadKey, "false").toBoolean

  /** Apply [[required]] to a builder (call sites may add their own). */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    required.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
