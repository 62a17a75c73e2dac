package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Opt-in optimizer rewrite (`spark.graft.approxDistinct=true`,
  * default OFF): every single-column `COUNT(DISTINCT x)` in an
  * aggregation is replanned as the mergeable HyperLogLog++ estimate
  * (`approx_count_distinct`) at `spark.graft.approxDistinctRsd`
  * (default 0.05).
  *
  * Why an OPTIMIZER rule and not a query rewrite: interactive /
  * dashboard workloads issue exact count-distincts reflexively, and at
  * 100 TB the exact form is the single most expensive aggregate shape
  * Spark plans — a per-group sort-based de-dup or an Expand that
  * multiplies the shuffle by the distinct-column count, with state
  * O(distinct values). The sketch form is one map-side-combinable
  * accumulator of a few KB per group, no second shuffle, mergeable
  * across partitions — the session opting in trades ≤ rsd relative
  * error for that plan, WITHOUT rewriting any SQL (the same queries
  * run exact in every other session; conf scoping is per-session, the
  * q155 child-session pattern).
  *
  * Scope guards: single deterministic child of atomic type (the
  * multi-column `COUNT(DISTINCT a, b)` form and nested types keep
  * their exact plan); FILTER clauses carry over on the wrapper; the
  * replacement keeps the original `resultId`, so downstream
  * references bind unchanged (both functions return LongType).
  *
  * Rule placement (matters for the multi-distinct case):
  * `injectOptimizerRule` adds to the operator-optimization batches,
  * which run BEFORE `RewriteDistinctAggregates` expands multi-distinct
  * aggregates. So an Aggregate carrying SEVERAL single-column
  * `COUNT(DISTINCT x)`s still has its original shape when this rule
  * fires, and EVERY one of them is rewritten — deliberately: that is
  * the rewrite's biggest win, because the exact plan for k distinct
  * columns is an Expand that multiplies the shuffled row count by
  * k+1, while k sketches ride ONE ordinary hash aggregation. Only the
  * multi-COLUMN `COUNT(DISTINCT a, b)` form keeps its exact plan
  * (pinned, with the two-distinct case, in ApproxDistinctSpec).
  */
object ApproxDistinctRewriteRule extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.approxDistinct"
  val RsdKey  = "spark.graft.approxDistinctRsd"

  private def sketchable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    val rsd = conf.getConfString(RsdKey, "0.05").toDouble
    plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case AggregateExpression(Count(Seq(child)), mode, true, filter, resultId)
              if child.deterministic && sketchable(child.dataType) =>
            AggregateExpression(new HyperLogLogPlusPlus(child, rsd),
              mode, isDistinct = false, filter, resultId)
        }
    }
  }
}
