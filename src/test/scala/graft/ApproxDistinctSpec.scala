package graft

import graft.plans.ApproxDistinctRewriteRule
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends SparkSpec {

  private def onSession(): SparkSession = {
    val child = spark.newSession()
    child.conf.set(ApproxDistinctRewriteRule.ConfKey, "true")
    child.conf.set(GraftSession.LocalSpreadKey, "false")
    child
  }

  test("opt-in: count(distinct) replans as HyperLogLog++, estimate inside the rsd band") {
    val s = onSession()
    import s.implicits._
    val df = (1 to 20000).map(i => (i % 7, (i % 4096).toLong)).toDF("g", "u")
    val q = df.groupBy($"g").agg(countDistinct($"u").as("nd"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("approx_count_distinct"), s"no HLL++ in plan:\n$opt")
    assert(!opt.toLowerCase.contains("distinct "), s"exact distinct survived:\n$opt")
    // exact truth from the SAME frame with the rule off (parent session)
    val exact = {
      import spark.implicits._
      (1 to 20000).map(i => (i % 7, (i % 4096).toLong)).toDF("g", "u")
        .groupBy($"g").agg(countDistinct($"u").as("nd"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    q.collect().foreach { r =>
      val (g, nd) = (r.getInt(0), r.getLong(1))
      val truth = exact(g).toDouble
      assert(math.abs(nd - truth) / truth < 0.2, s"g=$g est=$nd exact=$truth")
    }
  }

  test("default-off: the exact plan and exact answer are untouched") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 3, (i % 101).toLong)).toDF("g", "u")
    val q = df.groupBy($"g").agg(countDistinct($"u").as("nd"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
    assert(q.collect().map(_.getLong(1)).toSet == Set(101L))
  }

  test("guard: multi-column distinct is NOT rewritten and stays exact") {
    val s = onSession()
    import s.implicits._
    val df = (1 to 4000).map(i => (i % 2, (i % 50).toLong, (i % 20).toLong)).toDF("g", "a", "b")
    val multi = df.groupBy($"g").agg(countDistinct($"a", $"b").as("nd"))
    assert(!multi.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
    val exact = {
      import spark.implicits._
      (1 to 4000).map(i => (i % 2, (i % 50).toLong, (i % 20).toLong)).toDF("g", "a", "b")
        .groupBy($"g").agg(countDistinct($"a", $"b").as("nd"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    multi.collect().foreach(r => assert(r.getLong(1) == exact(r.getInt(0))))
  }

  test("two single-column distincts: BOTH rewrite (no Expand), each estimate in band") {
    // The rule runs in the operator-optimization batch, BEFORE
    // RewriteDistinctAggregates expands multi-distinct plans — so a
    // k-distinct aggregate is rewritten whole, trading the k+1-way
    // Expand for k mergeable sketches in ONE hash aggregation. This
    // pins that documented behavior.
    val s = onSession()
    import s.implicits._
    def frame(ss: SparkSession) = {
      import ss.implicits._
      (1 to 24000).map(i => (i % 5, (i % 3000).toLong, (i % 700).toLong)).toDF("g", "a", "b")
    }
    val q = frame(s).groupBy($"g")
      .agg(countDistinct($"a").as("nda"), countDistinct($"b").as("ndb"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert("approx_count_distinct".r.findAllIn(opt).size == 2, s"expected 2 HLL++ aggs:\n$opt")
    assert(!opt.toLowerCase.contains("distinct "), s"exact distinct survived:\n$opt")
    assert(!q.queryExecution.executedPlan.toString.contains("Expand"),
      "multi-distinct Expand survived the rewrite")
    val exact = frame(spark).groupBy($"g")
      .agg(countDistinct($"a").as("nda"), countDistinct($"b").as("ndb"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    q.collect().foreach { r =>
      val (ea, eb) = exact(r.getInt(0))
      assert(math.abs(r.getLong(1) - ea.toDouble) / ea < 0.2, s"a: est=${r.getLong(1)} exact=$ea")
      assert(math.abs(r.getLong(2) - eb.toDouble) / eb < 0.2, s"b: est=${r.getLong(2)} exact=$eb")
    }
  }

  test("rsd conf tightens the sketch") {
    val s = onSession()
    s.conf.set(ApproxDistinctRewriteRule.RsdKey, "0.01")
    import s.implicits._
    val df = (1 to 30000).map(i => ((i % 10000).toLong, 1)).toDF("u", "x")
    val nd = df.agg(countDistinct($"u").as("nd")).collect().head.getLong(0)
    assert(math.abs(nd - 10000.0) / 10000.0 < 0.05, nd.toString)
  }
}
