package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the pair-expansion / pair-verification hot paths
  * of the dedup and co-occurrence-graph operators.
  *
  * Both replace interpreted higher-order-function pipelines measured
  * as the dominant cost of their operators: in-bucket pair expansion
  * was `flatten(transform(ids, (x,i) => transform(slice(ids, i+2, …),
  * y => struct(x,y))))` — one interpreted closure dispatch plus an
  * O(B) `slice` copy per element (O(B²) copies per bucket) — and
  * weighted-Jaccard verification exploded every candidate pair into
  * per-token join rows (pairs × tokens shuffle). Semantics are
  * bit-identical to the forms they replace; see each kernel's note.
  */
object LongPairsUtil {
  /** All index-ordered pairs (a(i), a(j)) with i < j, in the same
    * (row-major) order the nested-transform form produced. Assumes
    * non-null elements (callers build the array with collect_list /
    * collect_set, which never emit null slots).
    */
  def pairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(x, a.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** (array<bigint>) → array<struct<a:bigint, b:bigint>> of all i<j
  * element pairs. On a SORTED input this yields exactly the a<b
  * candidate pairs the LSH-bucket and basket-census paths expand.
  */
case class LongArrayPairs(child: Expression) extends UnaryExpression {
  override def prettyName: String = "long_array_pairs"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    LongPairsUtil.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LongPairsUtil.pairs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact capped-weighted-Jaccard intersection mass Σ min(wa, wb) over
  * the shared tokens of two token-count arrays, each sorted ascending
  * by token (sort_array over struct(token, w) — binary UTF8 order,
  * the same order UTF8String.compare walks here). One merge pass, no
  * per-token join rows. Tokens are distinct within a doc (the frame
  * is a groupBy(id, token)), so the merge never double-counts.
  * Assumes non-null elements/fields (collect_list-built).
  */
object WeightedIntersectUtil {
  def icap(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0
    var s = 0L
    while (i < n && j < m) {
      val ra = a.getStruct(i, 2); val rb = b.getStruct(j, 2)
      val ta = ra.getUTF8String(0); val tb = rb.getUTF8String(0)
      val c = ta.compareTo(tb)
      if (c == 0) {
        s += math.min(ra.getLong(1), rb.getLong(1))
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    s
  }
}

case class WeightedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "weighted_intersect"
  override def dataType: DataType = LongType

  private def okArr(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(Array(f0, f1)), _) =>
      f0.dataType == StringType && f1.dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okArr(left.dataType) && okArr(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<string,bigint>> arguments, got " +
        s"${left.dataType.catalogString}/${right.dataType.catalogString}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    WeightedIntersectUtil.icap(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.WeightedIntersectUtil.icap($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Count of common elements of two arrays of (bigint, string) structs,
  * each sorted ascending by that struct order (sort_array's (long asc,
  * binary-string asc) — the rare-first canonical order of the
  * prefix-filter join). One merge pass; equals
  * size(array_intersect(...)) on the projected string field whenever
  * the long field is a FUNCTION of the string (a global df) and
  * elements are distinct within each array — exactly the
  * prefixJaccardPairs invariants. Assumes non-null elements/fields
  * (collect_list-built).
  */
object SortedCommonCountUtil {
  def count(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0
    var s = 0L
    while (i < n && j < m) {
      val ra = a.getStruct(i, 2); val rb = b.getStruct(j, 2)
      val da = ra.getLong(0); val db = rb.getLong(0)
      var c = java.lang.Long.compare(da, db)
      if (c == 0) c = ra.getUTF8String(1).compareTo(rb.getUTF8String(1))
      if (c == 0) { s += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    s
  }
}

case class SortedCommonCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sorted_common_count"
  override def dataType: DataType = LongType

  private def okArr(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(Array(f0, f1)), _) =>
      f0.dataType == LongType && f1.dataType == StringType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okArr(left.dataType) && okArr(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<bigint,string>> arguments, got " +
        s"${left.dataType.catalogString}/${right.dataType.catalogString}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SortedCommonCountUtil.count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.SortedCommonCountUtil.count($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Column-API surface. */
object pairs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.bridge

  def longArrayPairs(c: Column): Column =
    bridge.column(LongArrayPairs(bridge.expression(c)))

  def weightedIntersect(a: Column, b: Column): Column =
    bridge.column(WeightedIntersect(bridge.expression(a), bridge.expression(b)))

  def sortedCommonCount(a: Column, b: Column): Column =
    bridge.column(SortedCommonCount(bridge.expression(a), bridge.expression(b)))
}
