package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative data-quality constraint suite (the Deequ-style
  * check-as-metric pattern; reference behavior: server.js:137-156
  * validates essential fields row-by-row — this is the table-level
  * contract form of the same concern): each constraint computes one
  * scalar metric over the table and passes when the metric lands in
  * its declared [min, max] band.
  *
  * Scale shape: ALL single-table metrics evaluate in ONE aggregation
  * job (one scan, partial map-side agg — no per-constraint passes);
  * the result pivots to one row per constraint with a map-side
  * posexplode over an in-memory array. Referential containment
  * ([[containedIn]]) is the only check that joins — a broadcast
  * left-semi against the (small) dimension keys.
  */
object Constraints {

  /** One constraint: `metric` must be an aggregate expression
    * producing a numeric scalar; passes when min ≤ metric ≤ max.
    */
  final case class Check(name: String, metric: Column,
      min: Double, max: Double)

  /** Fraction of rows with `c` non-null. */
  def completeness(c: Column): Column =
    avg(when(c.isNotNull, 1.0).otherwise(0.0))

  /** distinct(c) / count(c) — 1.0 iff `c` is unique. At 100 TB use
    * [[approxUniqueness]]: a count-distinct over a key column is a
    * full shuffle of the key; the HLL form is one pass, mergeable.
    */
  def uniqueness(c: Column): Column =
    countDistinct(c).cast(DoubleType) / count(c).cast(DoubleType)

  def approxUniqueness(c: Column, rsd: Double = 0.01): Column =
    approx_count_distinct(c, rsd).cast(DoubleType) / count(c).cast(DoubleType)

  /** Fraction of non-null values inside the allowed set. */
  def containment(c: Column, allowed: Seq[String]): Column =
    avg(when(c.isin(allowed.map(lit): _*), 1.0)
      .otherwise(when(c.isNull, 1.0).otherwise(0.0)))

  /** Run every check in one aggregation pass; one output row per
    * check: (check_name, metric, passed), ordered by name.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(c => round(c.metric.cast(DoubleType), 6).as(c.name))
    val metrics = df.agg(aggs.head, aggs.tail: _*)
      .select(array(checks.map(c =>
        struct(lit(c.name).as("check_name"), col(c.name).as("metric"),
          (col(c.name) >= c.min && col(c.name) <= c.max).as("passed"))): _*).as("__a"))
      .select(explode(col("__a")).as("__c"))
    metrics.select(col("__c.check_name"), col("__c.metric"), col("__c.passed"))
      .orderBy(col("check_name"))
  }

  /** Referential-integrity metric as a one-row frame: fraction of
    * `fact.factKey` values present in `dim.dimKey` (nulls count as
    * contained — use [[completeness]] to police them). The dimension
    * side deduplicates then BROADCASTS into a left join, so the fact
    * table is never shuffled.
    */
  def containedIn(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, name: String, min: Double = 1.0): DataFrame =
    fact.select(col(factKey).as("__k"))
      .join(broadcast(dim.select(col(dimKey).as("__k")).distinct()
        .withColumn("__hit", lit(1))), Seq("__k"), "left")
      .agg(round(avg(when(col("__k").isNull || col("__hit").isNotNull, 1.0)
        .otherwise(0.0)), 6).as("metric"))
      .select(lit(name).as("check_name"), col("metric"),
        (col("metric") >= min).as("passed"))
}
