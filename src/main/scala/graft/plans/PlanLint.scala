package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Static scale-hazard lint over a query's physical plan — the
  * pre-flight check an ops team runs before promoting a pipeline to
  * the 100 TB cluster. Purely advisory: it reads the plan tree, never
  * executes the query.
  *
  * Rules (each names the hazard it would become at scale):
  *  - `cartesian-product` (error): CartesianProduct or
  *    BroadcastNestedLoopJoin — O(n·m) row expansion; a missing join
  *    key or an inequality-only condition.
  *  - `single-partition-window` (warn): a window function with an
  *    empty PARTITION BY — every row funnels through one task.
  *    Legitimate on calendar-bounded frames; fatal on fact frames.
  *  - `filter-not-pushed` (warn): a Filter sits directly on a parquet
  *    scan whose pushed set carries nothing beyond IsNotNull — the
  *    real predicate is evaluated post-materialization (arithmetic /
  *    UDFs on the column usually cause this).
  *  - `global-sort` (info): a global Sort that is not the child of a
  *    top-k (TakeOrdered) — an all-data range exchange; fine for
  *    final small outputs, a barrier for fact-sized frames.
  *  - `many-shuffles` (info): more than `shuffleBudget` hash
  *    exchanges in one query — usually a missed reuse or a diamond
  *    that wants a persist/checkpoint.
  */
object PlanLint {

  final case class Finding(rule: String, severity: String, node: String)

  def findings(df: DataFrame, shuffleBudget: Int = 8): Seq[Finding] = {
    val out = scala.collection.mutable.ArrayBuffer[Finding]()
    var shuffles = 0
    def short(p: SparkPlan): String = p.nodeName
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan); return
        case s: QueryStageExec        => walk(s.plan); return
        case t: InMemoryTableScanExec => walk(t.relation.cachedPlan); return
        case _: CartesianProductExec | _: BroadcastNestedLoopJoinExec =>
          out += Finding("cartesian-product", "error", short(p))
        case w: WindowExec if w.partitionSpec.isEmpty =>
          out += Finding("single-partition-window", "warn", short(p))
        case f: FilterExec =>
          // the scan hides under pass-through wrappers (ColumnarToRow,
          // InputAdapter, codegen boundaries) — peel them
          def scanBelow(p0: SparkPlan): Option[FileSourceScanExec] = p0 match {
            case s: FileSourceScanExec => Some(s)
            case _: ColumnarToRowExec | _: InputAdapter | _: WholeStageCodegenExec =>
              p0.children.headOption.flatMap(scanBelow)
            case _ => None
          }
          // IsNotNull pushes down for almost any predicate — the
          // hazard is a scan whose pushed set carries NOTHING ELSE
          // while a Filter still sits on top doing the real work
          def onlyNullChecks(pushed: String): Boolean =
            pushed.replaceAll("IsNotNull\\([^)]*\\)", "")
              .replaceAll("[\\[\\],\\s]", "").isEmpty
          scanBelow(f.child) match {
            case Some(scan) if scan.metadata.get("PushedFilters").exists(onlyNullChecks) =>
              out += Finding("filter-not-pushed", "warn", s"${short(f)} over ${short(scan)}")
            case _ => ()
          }
        case s: SortExec if s.global =>
          out += Finding("global-sort", "info", short(s))
        case e: ShuffleExchangeExec =>
          shuffles += 1; val _ = e
        case _: SortMergeJoinExec => () // fine per se; keyed and partitioned
        case _ => ()
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    if (shuffles > shuffleBudget)
      out += Finding("many-shuffles", "info", s"$shuffles hash exchanges (budget $shuffleBudget)")
    out.toSeq
  }

  /** The findings as a DataFrame (rule, severity, node) — so the lint
    * report composes with the rest of the engine (write it, join it
    * against an allowlist, alert on severity counts).
    */
  def lint(spark: SparkSession, df: DataFrame, shuffleBudget: Int = 8): DataFrame = {
    import spark.implicits._
    findings(df, shuffleBudget).toDF("rule", "severity", "node")
  }
}
