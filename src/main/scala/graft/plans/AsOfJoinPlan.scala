package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class Catalyst citizen:
  * logical node → strategy → physical exec, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (graft.functions.
  * GraftExtensions). This is the tier-(c) extension path for
  * semantics the built-in operators can't express directly — the
  * composition form (operators.AsOf, union + window) stays as the
  * pure-DataFrame alternative; both are oracled against DuckDB's
  * native ASOF JOIN.
  *
  * Physical shape (vs the union-merge form): each side is hash-
  * partitioned on its OWN key and locally sorted (key, time) — the
  * standard sort-merge requirement EnsureRequirements satisfies —
  * then ONE streaming merge pass per partition attaches the latest
  * right row at-or-before each left row. No union row-widening (the
  * union form carries null-padded structs of both sides through the
  * sort), no window state, and the merge is O(|L| + |R|) per
  * partition with one right-row copy each.
  *
  * Key/time are carried as resolved child ATTRIBUTES on the node (not
  * a positional contract): they flow into `references`, so column
  * pruning keeps them alive in the children while still trimming
  * everything else. Time attrs are sign-adjusted epoch-millis LongType
  * (forward joins negate, see operators.AsOf.nativeAsOf) so the exec
  * only ever merges "at-or-before on ascending longs".
  */
final case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    toleranceMs: Long) extends BinaryNode {
  // right payload is nullable: unmatched left rows get nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def references: AttributeSet =
    AttributeSet(Seq(leftKey, leftTime, rightKey, rightTime).flatMap(_.references))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    toleranceMs: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Hash on the key only — EnsureRequirements co-partitions the two
    * sides (same generic path SortMergeJoin uses).
    */
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey), requireAllClusterKeys = true, None),
    ClusteredDistribution(Seq(rightKey), requireAllClusterKeys = true, None))

  /** Local (key, time) sort per side — no global sort anywhere. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val keyType = leftKey.dataType
    val tol = toleranceMs
    val (lk, lt) = (BindReferences.bindReference(leftKey, leftOut),
      BindReferences.bindReference(leftTime, leftOut))
    val (rk, rt) = (BindReferences.bindReference(rightKey, rightOut),
      BindReferences.bindReference(rightTime, rightOut))
    val outAttrs = output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(Seq(keyType))
        val lKeyProj = UnsafeProjection.create(Seq(lk), leftOut)
        val rKeyProj = UnsafeProjection.create(Seq(rk), rightOut)
        // bind against a NULLABILITY-ADJUSTED input schema (right side
        // nullable) — BindReferences takes nullability from the input
        // attrs, and a non-nullable binding would read the null-right
        // row's fields as 0/false instead of null
        val outProj = UnsafeProjection.create(outAttrs,
          leftOut ++ rightOut.map(_.withNullability(true)))
        val nullRight = new GenericInternalRow(rightOut.length)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var rNext: InternalRow = _
          private var rNextKey: InternalRow = _
          private var rNextT: Long = _
          private var cand: InternalRow = _      // last right row merged past
          private var candKey: InternalRow = _
          private var candT: Long = _
          // Right rows with a null key or time are unmatchable by
          // definition — skip them here rather than trusting callers
          // to pre-filter (a null time would otherwise unbox to 0L =
          // epoch and silently win backward matches).
          private def advanceRight(): Unit = {
            rNext = null; rNextKey = null
            var found = false
            while (!found && rIter.hasNext) {
              val r = rIter.next()
              val k = rKeyProj(r)
              val tBoxed = rt.eval(r)
              if (!k.isNullAt(0) && tBoxed != null) {
                rNext = r; rNextKey = k.copy()
                rNextT = tBoxed.asInstanceOf[Long]
                found = true
              }
            }
          }
          advanceRight()

          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val ltBoxed = lt.eval(l)
            if (lKey.isNullAt(0) || ltBoxed == null) {
              // null left key/time matches nothing. Nothing to consume
              // either: nulls sort FIRST, so the right cursor is still
              // at-or-after every later (non-null) left row.
              outProj(joined(l, nullRight))
            } else {
              val lT = ltBoxed.asInstanceOf[Long]
              // consume right rows ordered before-or-at (lKey, lT)
              var cont = rNext != null
              while (cont) {
                val c = keyOrd.compare(rNextKey, lKey)
                if (c < 0 || (c == 0 && rNextT <= lT)) {
                  if (c == 0) { cand = rNext.copy(); candKey = rNextKey; candT = rNextT }
                  advanceRight()
                  cont = rNext != null
                } else cont = false
              }
              val matched = cand != null && keyOrd.compare(candKey, lKey) == 0 &&
                (tol <= 0L || math.abs(lT - candT) <= tol)
              outProj(joined(l, if (matched) cand else nullRight))
            }
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for graft's custom logical nodes. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tol) :: Nil
    case GroupedTopK(c, g, o, k, sm) =>
      GroupedTopKExec(planLater(c), g, o, k, sm) :: Nil
    case _ => Nil
  }
}

/** Bridge: build a DataFrame from the custom logical node. */
object AsOfJoinPlan {
  def dataFrame(spark: SparkSession, left: LogicalPlan, right: LogicalPlan,
      leftKey: String, leftTime: String, rightKey: String, rightTime: String,
      toleranceMs: Long): org.apache.spark.sql.DataFrame = {
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graft.DatasetBridge.ofRows(spark,
      AsOfJoin(left, right,
        attr(left, leftKey), attr(left, leftTime),
        attr(right, rightKey), attr(right, rightTime), toleranceMs))
  }
}
