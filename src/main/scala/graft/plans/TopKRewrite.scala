package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Descending, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rewrite (`spark.graft.topkRewrite=true`,
  * default OFF): `Filter(row_number() <= k)` over a Window is
  * pre-pruned with a [[GroupedTopK]] pass, so the window sorts
  * O(groups·k) survivors instead of every row. The original Window +
  * Filter stay on top — the rewrite only inserts a
  * semantics-preserving pruning step, it never re-derives the rank
  * itself.
  *
  * Applies when: a single row_number window expression, all partition
  * keys and the (single) sort key are plain child attributes, and the
  * filter is `rn <= IntLiteral` / `rn < IntLiteral`. Ascending order
  * keeps the k SMALLEST sort values (keepSmallest), descending the k
  * largest.
  *
  * Tie caveat (why this is opt-in): row_number over a NON-unique sort
  * key is already partition-layout-nondeterministic; the pruning may
  * then retain a different-but-equally-valid tie member. With a
  * unique total order (the house determinism rule, SURVEY §6) the
  * rewrite is exact.
  *
  * This is the `injectOptimizerRule` extension point — beside the
  * planner strategy (GraftStrategy), the codegen expressions, and
  * the logical nodes, it completes the extension surface.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.topkRewrite"

  private def limitOf(cond: org.apache.spark.sql.catalyst.expressions.Expression,
      rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      // Guards beyond the docstring: the sort key must be non-nullable
      // (GroupedTopKExec drops null-ord rows, but row_number ranks NULLs
      // FIRST under the ASC default — pruning would change the answer),
      // and the partition spec must be non-empty (a global row_number
      // has no clustering keys for the exec's required distribution).
      case f @ Filter(cond,
          w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
            partitionSpec, Seq(SortOrder(sortChild: Attribute, dir, _, _)), child, _))
          if !child.isInstanceOf[GroupedTopK] && !sortChild.nullable &&
            partitionSpec.nonEmpty &&
            partitionSpec.forall(_.isInstanceOf[Attribute]) =>
        limitOf(cond, alias.toAttribute) match {
          case Some(k) if k >= 1 =>
            val pruned = GroupedTopK(child,
              partitionSpec.map(_.asInstanceOf[Attribute]), sortChild, k,
              keepSmallest = dir == Ascending)
            if (dir == Ascending || dir == Descending)
              f.copy(child = w.copy(child = pruned))
            else f
          case _ => f
        }
    }
  }
}
