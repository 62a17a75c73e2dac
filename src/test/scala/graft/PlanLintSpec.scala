package graft

import graft.plans.PlanLint
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PlanLintSpec extends SparkSpec {

  private lazy val li = Tables(spark, sf("any"), "lineitem")
  private lazy val ord = Tables(spark, sf("any"), "orders")

  test("cartesian product is flagged as an error") {
    val f = PlanLint.findings(li.crossJoin(ord.limit(5)))
    assert(f.exists(x => x.rule == "cartesian-product" && x.severity == "error"), f.toString)
  }

  test("unpartitioned window is flagged; per-key window is not") {
    val wGlobal = Window.orderBy(col("l_orderkey"))
    val fGlobal = PlanLint.findings(li.withColumn("rn", row_number().over(wGlobal)))
    assert(fGlobal.exists(_.rule == "single-partition-window"), fGlobal.toString)

    val wKeyed = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    val fKeyed = PlanLint.findings(li.withColumn("rn", row_number().over(wKeyed)))
    assert(!fKeyed.exists(_.rule == "single-partition-window"), fKeyed.toString)
  }

  test("a compute-blocked predicate is flagged as filter-not-pushed") {
    // a raw parquet scan (the cached Tables() path has no file scan
    // under the filter); arithmetic on the column defeats parquet
    // pushdown (a bare cast would be unwrapped by the optimizer)
    val raw = spark.read.parquet(sf("any") + "/lineitem.parquet")
    val blocked = raw.filter(col("l_orderkey") % 7 === 0)
    val f = PlanLint.findings(blocked)
    assert(f.exists(_.rule == "filter-not-pushed"), f.toString)
    // a plain comparable predicate pushes down and is clean
    val clean = PlanLint.findings(raw.filter(col("l_orderkey") === 42L))
    assert(!clean.exists(_.rule == "filter-not-pushed"), clean.toString)
  }

  test("global sort is info-flagged; top-k (TakeOrdered) is not") {
    val f = PlanLint.findings(li.orderBy(col("l_extendedprice")))
    assert(f.exists(_.rule == "global-sort"), f.toString)
    val topk = PlanLint.findings(li.orderBy(col("l_extendedprice")).limit(10))
    assert(!topk.exists(_.rule == "global-sort"), topk.toString)
  }

  test("a healthy aggregate query lints clean at error/warn level") {
    val q = Queries.q1Agg.fn(spark, sf("any"))
    val f = PlanLint.findings(q).filterNot(_.severity == "info")
    assert(f.isEmpty, f.toString)
  }

  test("lint() returns the findings as a DataFrame") {
    val df = PlanLint.lint(spark, li.crossJoin(ord.limit(3)))
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("rule", "severity", "node"))
    assert(rows.exists(_.getString(0) == "cartesian-product"))
  }
}
