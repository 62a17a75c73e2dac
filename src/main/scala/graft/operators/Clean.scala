package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native re-expression of the reference's Transform stage
  * (reference: server.js:65-97 — validate → standardize → derive →
  * re-validate). All of it is declarative `Column` logic, so Catalyst
  * pushes the validation predicates into the parquet scan and prunes
  * unused columns at the source — the row-at-a-time JS loop becomes a
  * codegen'd whole-stage pipeline with no shuffle at all.
  */
object Clean {

  /** Drop rows where an essential column is null / blank / empty-array
    * (reference: server.js:69-76). Predicates are plan-level filters →
    * parquet pushdown where the format supports it.
    */
  def requireFields(df: DataFrame, essential: Seq[String]): DataFrame =
    essential.foldLeft(df) { (d, name) =>
      df.schema(name).dataType match {
        case StringType      => d.filter(col(name).isNotNull && trim(col(name)) =!= "")
        case ArrayType(_, _) => d.filter(col(name).isNotNull && size(col(name)) > 0)
        case _               => d.filter(col(name).isNotNull)
      }
    }

  /** Trim every string column; trim each element of array<string>
    * columns (reference: server.js:80-89).
    */
  def standardize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case StringType                  => trim(col(f.name)).as(f.name)
        case ArrayType(StringType, _)    => transform(col(f.name), e => trim(e)).as(f.name)
        case _                           => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** First element of an array column, null when empty — the
    * reference's `primary_domain` / `primary_website` derivation
    * (server.js:86-89). `element_at` returns null past the end.
    */
  def firstOf(c: Column): Column = when(size(c) > 0, element_at(c, 1))

  /** Ingest timestamp (reference: server.js:90). `at` defaults to the
    * batch's current_timestamp(); pass a literal for reproducible runs.
    */
  def withIngestTimestamp(df: DataFrame, at: Column = current_timestamp()): DataFrame =
    df.withColumn("last_updated", at)

  /** Data-quality rejection report: one wide row, a count per failed
    * rule. `rules` maps rule-name → "row is valid" predicate. A single
    * scan, all counters in one partial-aggregated pass (no shuffle of
    * raw rows at any scale).
    */
  def qualityReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).cast(LongType).as("total") +:
      rules.map { case (n, valid) => sum(when(!valid, 1L).otherwise(0L)).cast(LongType).as(n) }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
