package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Order-independent table fingerprints for replication / migration
  * validation: did two copies of a table end up with the same rows,
  * without sorting or moving either copy?
  *
  * Shape: per-row xxhash64 over every column, folded with the
  * commutative-associative pair (bit_xor, sum) plus a count. Partial
  * aggregation reduces each partition to three longs, so comparing
  * two 100 TB tables costs one scan each and shuffles O(partitions)
  * rows — no sort, no join. Collisions: forging an equal xor AND an
  * equal sum AND an equal count across a row multiset requires a
  * coordinated 128-bit coincidence; for validation (not adversarial
  * integrity) that is the standard engineering bar.
  */
object Integrity {

  /** Three-component fingerprint of the full frame (all columns, any
    * row order, any partitioning): (n_rows, xor_hash, sum_hash).
    */
  def fingerprint(df: DataFrame): DataFrame = {
    val h = xxhash64(df.columns.map(col): _*)
    df.select(h.as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor_hash"),
        // DECIMAL(38,0) accumulator: a raw long sum of hashes overflows
        // (and ANSI mode turns that into a runtime error, correctly)
        sum(col("__h").cast("decimal(38,0)")).as("sum_hash"))
  }

  /** True iff the two frames contain identical row multisets (same
    * columns in the same order assumed).
    */
  def same(a: DataFrame, b: DataFrame): Boolean = {
    def row(df: DataFrame): Row = fingerprint(df).head()
    row(a) == row(b)
  }
}
