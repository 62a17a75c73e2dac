package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, EqualNullSafe, EqualTo, Expression, ExprId, GreaterThan, GreaterThanOrEqual, If, IntegralDivide, LessThan, LessThanOrEqual, Literal, NamedExpression, PredicateHelper, SortOrder}
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Explode, Sequence}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, ShortType}

/** Opt-in optimizer rewrite (`spark.graft.rangeJoinRewrite=true`,
  * default OFF): an INNER join whose condition has NO equi predicate
  * but bounds one left-side column into a right-side interval —
  * `l BETWEEN lo AND hi` in any conjunct order/direction — is
  * replanned as a banded equi-join: the left probe gets a band id
  * `l div w`, the right side replicates each row across the band ids
  * its interval overlaps (`sequence(lo div w, hi div w)` exploded),
  * and the join becomes a hash join on the band with the ORIGINAL
  * condition re-applied on top. Spark's stock planner runs this shape
  * as a broadcast-nested-loop — O(n·m) compares and a whole-side
  * broadcast; the rewrite is the relational form of
  * [[graft.operators.RangeJoin]], applied automatically.
  *
  * Exactly-once pairing needs no dedup: truncating division is
  * monotone, so `l ∈ [lo, hi]` puts l's single band inside the
  * replicated band range, and each (l, r) pair meets on exactly one
  * band — l's own.
  *
  * Band width comes from `spark.graft.rangeJoinBand` (same units as
  * the compared column; default 86400 — one day of epoch-seconds).
  * Replication per right row is O(interval/width + 1): pick the width
  * near the typical interval length. Empty intervals (lo > hi)
  * explode to zero bands and drop early, matching their zero matches.
  *
  * Guards: single band column on the left; both bounds reference only
  * the right side; integral types only (short/int/long — time columns
  * enter as epoch micros per the house convention; see [[bandable]]);
  * no equi conjunct between the sides (those plans already
  * hash-join); deterministic bound expressions.
  */
object RangeJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.rangeJoinRewrite"
  val BandKey = "spark.graft.rangeJoinBand"

  private val BinCol = "__graft_band"

  /** Integral only: time columns enter as epoch micros (`unix_micros`,
    * the house convention) — an ANSI Cast(date/timestamp → long) is
    * not generally allowed, and float bands would re-open the
    * truncation-vs-floor asymmetry for negatives.
    */
  private def bandable(dt: DataType): Boolean = dt match {
    case ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (leftCol, bound, boundIsLower) from one conjunct, if it
    * constrains a left attribute by a right-only expression.
    * Strictness is NOT tracked here — the original condition is
    * re-applied verbatim on top of the banded join, so strict vs
    * non-strict bounds only affect the final filter, not banding.
    */
  private def boundOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Attribute, Expression, Boolean)] = {
    def leftAttr(x: Expression): Option[Attribute] = x match {
      case a: Attribute if left.outputSet.contains(a) && bandable(a.dataType) => Some(a)
      case _ => None
    }
    def rightOnly(x: Expression): Boolean =
      x.deterministic && x.references.nonEmpty &&
        x.references.subsetOf(right.outputSet) && bandable(x.dataType)
    e match {
      case GreaterThanOrEqual(l, r) if leftAttr(l).isDefined && rightOnly(r) =>
        Some((leftAttr(l).get, r, true))
      case GreaterThan(l, r) if leftAttr(l).isDefined && rightOnly(r) =>
        Some((leftAttr(l).get, r, true))
      case LessThanOrEqual(l, r) if leftAttr(l).isDefined && rightOnly(r) =>
        Some((leftAttr(l).get, r, false))
      case LessThan(l, r) if leftAttr(l).isDefined && rightOnly(r) =>
        Some((leftAttr(l).get, r, false))
      case GreaterThanOrEqual(r, l) if leftAttr(l).isDefined && rightOnly(r) =>
        Some((leftAttr(l).get, r, false))
      case GreaterThan(r, l) if leftAttr(l).isDefined && rightOnly(r) =>
        Some((leftAttr(l).get, r, false))
      case LessThanOrEqual(r, l) if leftAttr(l).isDefined && rightOnly(r) =>
        Some((leftAttr(l).get, r, true))
      case LessThan(r, l) if leftAttr(l).isDefined && rightOnly(r) =>
        Some((leftAttr(l).get, r, true))
      case _ => None
    }
  }

  private def hasEquiBetween(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = conjuncts.exists {
    case EqualTo(a, b) =>
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
    case EqualNullSafe(a, b) =>
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
    case _ => false
  }

  private def toBand(e: Expression, w: Long): Expression =
    new IntegralDivide(Cast(e, LongType), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    val w = conf.getConfString(BandKey, "86400").toLong
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && left.resolved && right.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiBetween(conjuncts, left, right)) j
        else {
          val bounds = conjuncts.flatMap(boundOf(_, left, right))
          val byAttr = bounds.groupBy(_._1)
          byAttr.collectFirst {
            case (a, bs) if bs.exists(_._3) && bs.exists(!_._3) => (a, bs)
          } match {
            case Some((bandAttr, bs)) =>
              val lo = bs.find(_._3).get._2
              val hi = bs.find(!_._3).get._2
              // left: band id of the probe column
              val lBin = AttributeReference(BinCol, LongType, nullable = true)()
              val lProj = Project(left.output :+
                Alias(toBand(bandAttr, w), BinCol)(exprId = lBin.exprId), left)
              // right: one row per overlapped band; empty interval → 0 rows
              val loB = toBand(lo, w); val hiB = toBand(hi, w)
              // Sequence is TimeZoneAware: without an explicit zone the
              // expression never resolves (even over pure longs)
              val seq = If(LessThanOrEqual(loB, hiB),
                Sequence(loB, hiB, Some(Literal(1L)),
                  Some(conf.sessionLocalTimeZone)),
                Literal.create(Array.empty[Long],
                  ArrayType(LongType, containsNull = false)))
              val rBin = AttributeReference(BinCol + "_r", LongType, nullable = false)()
              val rGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
                outer = false, qualifier = None,
                generatorOutput = Seq(rBin), child = right)
              val newJoin = Join(lProj, rGen, Inner,
                Some(And(EqualTo(lBin, rBin), cond)), hint)
              Project(j.output.map(_.asInstanceOf[NamedExpression]), newJoin)
            case None => j
          }
        }
    }
  }
}
