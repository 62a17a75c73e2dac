package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-plan shape assertions on the CLUSTER load path (local
  * spread OFF — a child session with the flag cleared, so scans are
  * the plain parquet reads a real cluster would run). These lock in
  * the properties that matter at 100 TB: pushdown reaching the scan,
  * column pruning, dims broadcast, partial aggregation before the
  * shuffle, top-k never globally sorting.
  */
class PlanSpec extends SparkSpec {

  private lazy val cold: SparkSession = {
    val s = spark.newSession()
    s.conf.set(GraftSession.LocalSpreadKey, "false")
    s
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def q(qd: QueryDef): DataFrame = qd.fn(cold, sf("any"))

  test("q2: filters and projection push into the parquet scan") {
    val p = plan(q(Queries.q2Filter))
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p)
    assert(p.contains("GreaterThan"), s"range filter should push down:\n$p")
    // column pruning: the scan reads only the 6 referenced columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"scan should prune unreferenced columns:\n$readSchema")
  }

  test("q1: aggregation is partial (map-side) before the shuffle") {
    val p = plan(q(Queries.q1Agg))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"expected map-side partial aggregation:\n$p")
  }

  test("q3/q5: dimension sides broadcast, never shuffled") {
    assert(plan(q(Queries.q3Join)).contains("BroadcastHashJoin"))
    val p5 = plan(q(Queries.q5Multi))
    assert(p5.contains("BroadcastHashJoin"), p5)
  }

  test("q7: top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan(q(Queries.q7TopK))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q4: semi join stays a join, not a distinct+inner rewrite") {
    val p = plan(q(Queries.q4Semi))
    assert(p.contains("LeftSemi"), p)
  }

  test("cold session reads are plain scans (no load-path exchange)") {
    val p = plan(Tables(cold, sf("any"), "lineitem").select("l_orderkey"))
    assert(!p.contains("Exchange"), s"ungated load path must not repartition:\n$p")
  }
}
