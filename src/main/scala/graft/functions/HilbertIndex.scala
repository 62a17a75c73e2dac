package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D cell — the locality-preserving sibling
  * of [[graft.operators.Layout.mortonKey]]: consecutive Hilbert
  * indices are always grid-ADJACENT (no Z-curve jumps), so files cut
  * along the curve cover tighter (x, y) rectangles and range
  * predicates on either dimension touch fewer files at 100 TB.
  *
  * Inputs are the low `bits` bits of two longs (callers quantize,
  * exactly as with the Morton writer); output is the distance along
  * the order-`bits` curve over the 2^bits × 2^bits grid. The classic
  * xy→d walk (bit test, quadrant accumulate, reflect-and-swap rotate)
  * runs as ONE tight native loop — a custom codegen Expression, not a
  * per-level `when`-chain, whose expression tree would grow ~4× per
  * level and fall out of whole-stage codegen past order 4.
  *
  * Reference semantics: q261_hilbert's 4-level unrolled arithmetic
  * (Queries.scala) and its DuckDB oracle mirror this walk bit for bit
  * at order 4; q562 hash-matches this expression against an
  * independently unrolled oracle at order 8.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert bits out of range: $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index needs (BIGINT, BIGINT), got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertIndex.xy2d(bits, xv.asInstanceOf[Long], yv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t"); val d = ctx.freshName("d")
      s"""
      long $n = 1L << $bits;
      long $x = $xs & ($n - 1L);
      long $y = $ys & ($n - 1L);
      long $d = 0L;
      for (long $s = $n / 2L; $s > 0L; $s /= 2L) {
        long $rx = (($x & $s) > 0L) ? 1L : 0L;
        long $ry = (($y & $s) > 0L) ? 1L : 0L;
        $d += $s * $s * ((3L * $rx) ^ $ry);
        if ($ry == 0L) {
          if ($rx == 1L) { $x = $n - 1L - $x; $y = $n - 1L - $y; }
          long $t = $x; $x = $y; $y = $t;
        }
      }
      ${ev.value} = $d;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Interpreted twin of the generated loop (and the spec oracle). */
  def xy2d(bits: Int, xIn: Long, yIn: Long): Long = {
    val n = 1L << bits
    var x = xIn & (n - 1L); var y = yIn & (n - 1L)
    var d = 0L
    var s = n / 2L
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1L - x; y = n - 1L - y }
        val t = x; x = y; y = t
      }
      s /= 2L
    }
    d
  }
}
