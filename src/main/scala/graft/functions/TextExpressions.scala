package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression.
  *
  * Training-corpus text cleaning starts with canonical forms: the
  * same visible string can arrive as composed (U+00E9) or decomposed
  * (U+0065 U+0301) codepoints, and NFKC additionally folds
  * compatibility characters (ligatures, full-width forms) — without
  * normalization, dedup hashes and token counts split on invisible
  * differences. The JDK carries the full Unicode tables
  * (java.text.Normalizer), so this needs no dependency; a custom
  * expression (not a UDF) keeps null handling, constant folding, and
  * whole-stage codegen — the generated code calls one static helper,
  * no closure dispatch, no serialization.
  */
object UnicodeNormalizeUtil {
  val validForms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def norm(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized avoids the rebuild for the
    // (dominant, in real corpora) already-normalized case
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else if (!UnicodeNormalizeUtil.validForms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNormalizeUtil.validForms.mkString("/")}, got '$form'")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalizeUtil.norm(input.asInstanceOf[UTF8String],
      java.text.Normalizer.Form.valueOf(form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // `form` is validated against a fixed identifier set, so it can be
    // spliced as the enum constant — resolved once at class-load, not
    // per row
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormalizeUtil.norm($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deflate compression ratio as a native Catalyst expression.
  *
  * compressed_bytes / raw_bytes over the UTF-8 encoding — the
  * classic cheap redundancy detector for corpus curation (CCNet/
  * RedPajama-style stacks use it to drop machine-generated and
  * boilerplate-heavy pages: highly repetitive text compresses far
  * below prose's ~0.4–0.7 band, random/encrypted blobs sit near 1).
  * Level and strategy are FIXED (BEST_SPEED, default strategy,
  * nowrap) so the ratio is deterministic for a given input on a
  * given zlib build. Map-side, zero shuffle; one static helper call
  * from generated code — the same no-UDF discipline as
  * [[UnicodeNormalize]].
  */
object CompressRatioUtil {
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }
}

case class CompressRatio(child: Expression) extends UnaryExpression {
  override def prettyName: String = "compress_ratio"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    CompressRatioUtil.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressRatioUtil.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API surface for the text expressions. */
object text {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.bridge

  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    bridge.column(UnicodeNormalize(bridge.expression(c), form))

  def compressRatio(c: Column): Column =
    bridge.column(CompressRatio(bridge.expression(c)))
}
