package graft

import graft.operators.Integrity
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {

  private lazy val base = {
    import spark.implicits._
    (1 to 500).map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "name", "v")
  }

  test("fingerprint is invariant to row order and partitioning") {
    val a = Integrity.fingerprint(base).head()
    val shuffled = base.orderBy(rand(42)).repartition(7)
    val b = Integrity.fingerprint(shuffled).head()
    assert(a == b)
    assert(Integrity.same(base, shuffled))
  }

  test("a single changed cell changes the fingerprint") {
    val tweaked = base.withColumn("v",
      when(col("id") === 250L, col("v") + 0.0001).otherwise(col("v")))
    assert(!Integrity.same(base, tweaked))
  }

  test("a dropped row changes the fingerprint (count component)") {
    assert(!Integrity.same(base, base.filter(col("id") =!= 1L)))
  }

  test("duplicated row is detected (multiset, not set, semantics)") {
    val dup = base.unionAll(base.filter(col("id") === 1L))
    assert(!Integrity.same(base, dup))
  }

  test("fingerprint aggregation is partial (map-side) before the shuffle") {
    val p = Integrity.fingerprint(base).queryExecution.executedPlan.toString
    assert(p.contains("partial_"), s"expected map-side partials:\n$p")
  }
}
