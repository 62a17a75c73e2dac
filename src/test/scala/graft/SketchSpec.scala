package graft

import org.apache.spark.sql.functions._

/** Accuracy contract for the HLL sketch query: the approx count must
  * land within the configured relative error of the exact distinct
  * count. The exact path is computed HERE (test-only) — the shipped
  * `sketch_hll` query deliberately carries only the sketch (see
  * Queries.sketchHll).
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val dir = sf("lineitem")
    val approx = Queries.sketchHll.fn(spark, dir)
      .select(col("l_returnflag"), col("approx_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, ex) =>
      val ap = approx(flag).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05,
        s"group $flag: approx $ap vs exact $ex drifted beyond 5%")
    }
  }
}
