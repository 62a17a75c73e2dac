package graft

import graft.operators.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: the state ⊕ delta fold must be
  * associative and equivalent to a full recompute — the contract that
  * lets a 100 TB materialized view refresh at O(new partition) cost.
  * (The DuckDB oracle for `etl_incremental_agg` checks the same
  * identity end-to-end on real data; these cases pin the algebra on
  * adversarial shapes: disjoint keys, overlapping keys, empty delta.)
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: Seq[(String, Double)]): DataFrame =
    rows.toDF("k", "v")

  private def full(batches: Seq[DataFrame]): Array[org.apache.spark.sql.Row] =
    Incremental.finalizeView(
      Incremental.partials(batches.reduce(_ unionByName _), "k", col("v")), "k")
      .orderBy("k").collect()

  private def folded(batches: Seq[DataFrame]): Array[org.apache.spark.sql.Row] = {
    val state = batches.map(b => Incremental.partials(b, "k", col("v")))
      .reduce((s, d) => Incremental.merge(s, d, "k"))
    Incremental.finalizeView(state, "k").orderBy("k").collect()
  }

  private val b1 = Seq("a" -> 10.0, "a" -> 20.0, "b" -> 5.0)
  private val b2 = Seq("a" -> 1.5, "c" -> 100.0)          // overlaps a, adds c
  private val b3 = Seq("b" -> -3.25, "c" -> 0.0)          // negative + zero values

  test("three-batch fold equals full recompute (count/sum/avg/min/max)") {
    val bs = Seq(batch(b1), batch(b2), batch(b3))
    assert(folded(bs).toSeq == full(bs).toSeq)
  }

  test("empty delta is the identity") {
    val s  = Incremental.partials(batch(b1), "k", col("v"))
    val e  = Incremental.partials(batch(Seq.empty), "k", col("v"))
    val r  = Incremental.finalizeView(Incremental.merge(s, e, "k"), "k").orderBy("k").collect()
    val r0 = Incremental.finalizeView(s, "k").orderBy("k").collect()
    assert(r.toSeq == r0.toSeq)
  }

  test("fold order does not matter (associativity + commutativity)") {
    val abc = folded(Seq(batch(b1), batch(b2), batch(b3)))
    val cba = folded(Seq(batch(b3), batch(b1), batch(b2)))
    assert(abc.toSeq == cba.toSeq)
  }
}
