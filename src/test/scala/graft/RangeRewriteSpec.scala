package graft

import graft.plans.RangeJoinRewriteRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

class RangeRewriteSpec extends SparkSpec {

  private def hasBnlj(df: DataFrame): Boolean = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case _: BroadcastNestedLoopJoinExec => true
      case other => other.children.exists(walk)
    }
    df.collect() // finalize AQE
    walk(df.queryExecution.executedPlan)
  }

  private def withRule[A](band: Long)(f: => A): A = {
    spark.conf.set(RangeJoinRewriteRule.ConfKey, "true")
    spark.conf.set(RangeJoinRewriteRule.BandKey, band.toString)
    try f
    finally {
      spark.conf.unset(RangeJoinRewriteRule.ConfKey)
      spark.conf.unset(RangeJoinRewriteRule.BandKey)
    }
  }

  test("interval join loses its BNLJ and keeps its answer (incl. negatives + empty intervals)") {
    import spark.implicits._
    val probes = Seq((1L, -250L), (2L, -10L), (3L, 0L), (4L, 77L), (5L, 1000L))
      .toDF("pid", "t")
    val ivals = Seq(
      (10L, -300L, -200L), // catches pid 1
      (11L, -20L, 20L),    // catches pids 2, 3
      (12L, 50L, 49L),     // EMPTY interval (lo > hi): matches nothing
      (13L, 0L, 2000L))    // catches pids 3, 4, 5
      .toDF("iid", "lo", "hi")
    def q = probes.join(ivals, col("t") >= col("lo") && col("t") <= col("hi"))
      .select(col("pid"), col("iid"))
    val baseline = q.collect().map(_.toString).sorted.toSeq
    assert(hasBnlj(q), "stock plan for a pure range join is a BNLJ")
    withRule(band = 100L) {
      val rewritten = q
      assert(!hasBnlj(rewritten), "banded rewrite must hash-join")
      assert(rewritten.collect().map(_.toString).sorted.toSeq == baseline)
    }
  }

  test("strict bounds and reversed operand order still rewrite exactly") {
    import spark.implicits._
    val probes = (0L to 50L).map(i => (i, i * 7L)).toDF("pid", "t")
    val ivals = Seq((1L, 0L, 100L), (2L, 99L, 200L), (3L, 200L, 350L))
      .toDF("iid", "lo", "hi")
    // lo < t AND hi > t — strict, with the attribute on the right side
    def q = probes.join(ivals, col("lo") < col("t") && col("hi") > col("t"))
      .select(col("pid"), col("iid"))
    val baseline = q.collect().map(_.toString).sorted.toSeq
    withRule(band = 64L) {
      assert(!hasBnlj(q))
      assert(q.collect().map(_.toString).sorted.toSeq == baseline)
    }
  }

  test("joins with an equi conjunct are left alone") {
    import spark.implicits._
    val a = Seq((1L, "k1", 5L)).toDF("ida", "k", "t")
    val b = Seq((2L, "k1", 0L, 10L)).toDF("idb", "kk", "lo", "hi")
    val q = a.join(b, col("k") === col("kk") &&
      col("t") >= col("lo") && col("t") <= col("hi"))
    withRule(band = 10L) {
      // equi key present → stock hash join already; plan must not carry
      // the rewrite's band generator
      assert(!q.queryExecution.optimizedPlan.toString.contains("__graft_band"),
        q.queryExecution.optimizedPlan.toString)
      assert(q.count() == 1L)
    }
  }

  test("q155_range_rewrite: child session isolates the flag; plan hash-joins on the band") {
    val q = Queries.all.find(_.name == "q155_range_rewrite").get
    val df = q.fn(spark, sf("x"))
    // the conf-scoped child session must not leak the flag back
    assert(spark.conf.get(RangeJoinRewriteRule.ConfKey, "false") == "false")
    // the rewrite fired: band generator in the optimized plan, no BNLJ
    assert(df.queryExecution.optimizedPlan.toString.contains("__graft_band"),
      df.queryExecution.optimizedPlan.toString)
    assert(!hasBnlj(df), "banded rewrite must eliminate the BNLJ")
    assert(df.count() > 0)
  }

  test("rule off by default: plan untouched") {
    import spark.implicits._
    val a = Seq((1L, 5L)).toDF("ida", "t")
    val b = Seq((2L, 0L, 10L)).toDF("idb", "lo", "hi")
    val q = a.join(b, col("t") >= col("lo") && col("t") <= col("hi"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    assert(q.count() == 1L)
  }
}
