package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
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
  def size(s: UTF8String): Long = {
    val raw = s.getBytes
    if (raw.length == 0) return 0L
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed
    } finally d.end()
  }

  def ratio(s: UTF8String): Double = {
    val raw = s.numBytes()
    if (raw == 0) 1.0 else size(s).toDouble / raw
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

/** Deflate compressed SIZE in bytes (same fixed deflate parameters as
  * [[CompressRatio]]) — the building block for normalized compression
  * distance: NCD(a,b) = (C(ab) − min(C(a),C(b))) / max(C(a),C(b)).
  */
case class CompressSize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "compress_size"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    CompressRatioUtil.size(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressRatioUtil.size($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaro–Winkler string similarity as a native Catalyst expression.
  *
  * The fuzzy-name metric for record linkage: Jaro's windowed common-
  * character ratio with Winkler's common-prefix boost (p=0.1, prefix
  * capped at 4, applied only when Jaro > 0.7). Spark has levenshtein
  * but no Jaro family; this fills the gap with the SAME conventions
  * as DuckDB/RapidFuzz so results are engine-exact — notably the
  * transposition count is the INTEGER half of the mismatched-match
  * count (verified empirically against DuckDB on 5000 random pairs),
  * not the fractional t/2 some textbooks use. Operates on UTF-16
  * code units (equals byte semantics for ASCII keys, the linkage
  * case). O(len·window) per pair, map-side, codegen'd via one static
  * helper — no UDF.
  */
object JaroWinklerUtil {
  def sim(a0: UTF8String, b0: UTF8String): Double = {
    val a = a0.toString; val b = b0.toString
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la); val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mD = m.toDouble
    val jaro = (mD / la + mD / lb + (mD - t / 2) / mD) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lMax = math.min(4, math.min(la, lb))
    while (l < lMax && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${left.dataType.catalogString}/${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerUtil.sim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.JaroWinklerUtil.sim($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Longest-common-subsequence LENGTH over two token arrays as a native
  * Catalyst expression — the ROUGE-L / diff kernel.
  *
  * The declarative form (nested `aggregate` higher-order functions
  * building each DP row with `concat(acc, array(...))`) runs
  * interpreted: per-cell closure dispatch plus an O(row) array copy
  * per cell — O(n·m²) copies and the dominant cost of text_rouge_l.
  * This expression runs the same DP as two flat int rows inside
  * whole-stage codegen via one static helper: O(n·m) cells, zero
  * allocation beyond the two rows. Bit-identical recurrence:
  * cur[j] = a_i = b_j ? prev[j−1]+1 : max(prev[j], cur[j−1]); null
  * array → null; null ELEMENTS never match (the HOF's three-valued
  * `when` takes the otherwise branch).
  */
object LcsLenUtil {
  def lcs(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val as = new Array[UTF8String](n)
    var i = 0
    while (i < n) { as(i) = if (a.isNullAt(i)) null else a.getUTF8String(i); i += 1 }
    // materialize b's elements ONCE — extracting per inner-loop cell
    // repeats the isNullAt+getUTF8String work O(n·m) times on the hot
    // DP path this expression exists to speed up
    val bs = new Array[UTF8String](m)
    var jj = 0
    while (jj < m) { bs(jj) = if (b.isNullAt(jj)) null else b.getUTF8String(jj); jj += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    i = 0
    while (i < n) {
      val ai = as(i)
      var j = 0
      while (j < m) {
        val bj = bs(j)
        cur(j + 1) =
          if (ai != null && bj != null && ai.equals(bj)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      cur(0) = 0
      i += 1
    }
    prev(m)
  }
}

case class LcsLen(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "lcs_len"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> arguments, got " +
        s"${left.dataType.catalogString}/${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    LcsLenUtil.lcs(l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.LcsLenUtil.lcs($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Dynamic-time-warping distance over two BIGINT series as a native
  * Catalyst expression: |Δ| step cost, no warping window — exact
  * integer arithmetic, so the result is bit-identical to the
  * interpreted fold-of-folds formulation it replaces (whose per-cell
  * `concat` copies made the DP O(n·m²)). Standard unconstrained DTW:
  * D[i][j] = |a_i − b_j| + min(D[i−1][j], D[i][j−1], D[i−1][j−1]),
  * seeded with the cumulative first row/column. Null array → null;
  * either series empty → null (the HOF form degenerates there and no
  * caller feeds one); a null ELEMENT → null (matching the HOF fold,
  * which poisons its accumulator at the first null |Δ|).
  */
object DtwLongUtil {
  /** Null-aware entry: a null ELEMENT anywhere poisons the fold in the
    * HOF form (null accumulator from the first null |Δ| onward), so
    * bit-identity requires returning SQL NULL — getLong on a null slot
    * would silently read 0 and diverge. The O(n+m) pre-scan is noise
    * next to the O(n·m) DP.
    */
  def dtwNullable(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < m) { if (b.isNullAt(i)) return null; i += 1 }
    java.lang.Long.valueOf(dtw(a, b))
  }

  def dtw(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var prev = new Array[Long](m)
    var cur = new Array[Long](m)
    val a0 = a.getLong(0)
    var j = 0
    var run = 0L
    while (j < m) { // first row: cumulative |a_0 − b_j| (the fold's row1)
      run += math.abs(a0 - b.getLong(j))
      prev(j) = run
      j += 1
    }
    var i = 1
    while (i < n) {
      val ai = a.getLong(i)
      cur(0) = prev(0) + math.abs(ai - b.getLong(0))
      j = 1
      while (j < m) {
        val c = math.abs(ai - b.getLong(j))
        val best = math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
        cur(j) = c + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m - 1)
  }
}

case class DtwLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "dtw_long"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> arguments, got " +
        s"${left.dataType.catalogString}/${right.dataType.catalogString}")
  }
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (a.numElements() == 0 || b.numElements() == 0) null
    else DtwLongUtil.dtwNullable(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val boxed = ctx.freshName("dtwBoxed")
      s"""
      if ($l.numElements() == 0 || $r.numElements() == 0) { ${ev.isNull} = true; }
      else {
        java.lang.Long $boxed = graft.functions.DtwLongUtil.dtwNullable($l, $r);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.longValue(); }
      }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Optimal-partitioning changepoint DP (the q419_pelt kernel) as a
  * native Catalyst expression. Inputs are the 1-based-prefixed
  * cumulative sums the query already builds — s0 = [0.0, sc_1..sc_n],
  * ss0 = [0.0, ssc_1..ssc_n] — plus the quantized penalty bq; output
  * is the SORTED breakpoint chain [0, ..., n] (array<int>), exactly
  * the `bs` column of the declarative form.
  *
  * The declarative form is TWO nested interpreted `aggregate` HOFs:
  * the O(n²) cost-table fold re-builds its accumulator struct with
  * `concat(acc.f, array(m+bq))` per step (an O(n) copy per cell on top
  * of closure dispatch — O(n³) copies overall), then an O(n) backtrack
  * fold with the same copy-per-step shape. This expression runs the
  * identical recurrence as flat double/int arrays in one static
  * helper: per cell cand(ss) = f(ss) + floor((Δss − Δs²/len)·100 +
  * 0.5), f(tt) = min(cand) + bq with the FIRST argmin recorded
  * (array_min + array_position semantics — cand is NaN-free since the
  * inputs are finite and len ≥ 1), then backtrack from n while the
  * index is positive and sort. Bit-identical: same IEEE ops in the
  * same order, ties broken to the first index, assuming non-null
  * array elements (the builders are collect_list-based and never
  * produce null slots).
  */
object PeltUtil {
  def breakpoints(s0: org.apache.spark.sql.catalyst.util.ArrayData,
      ss0: org.apache.spark.sql.catalyst.util.ArrayData,
      bq: Double): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = s0.numElements() - 1
    val s = new Array[Double](n + 1)
    val ss = new Array[Double](n + 1)
    var i = 0
    while (i <= n) { s(i) = s0.getDouble(i); ss(i) = ss0.getDouble(i); i += 1 }
    val f = new Array[Double](n + 1)
    val cp = new Array[Int](math.max(n, 0))
    var tt = 1
    while (tt <= n) {
      var m = Double.NaN
      var pos = 0
      var sEnd = s(tt); var ssEnd = ss(tt)
      var sIdx = 0
      while (sIdx < tt) {
        val len = (tt - sIdx).toDouble
        val ds = sEnd - s(sIdx)
        val dss = ssEnd - ss(sIdx)
        val cand = f(sIdx) + math.floor((dss - ds * ds / len) * 100.0 + 0.5)
        if (sIdx == 0 || cand < m) { m = cand; pos = sIdx }
        sIdx += 1
      }
      f(tt) = m + bq
      cp(tt - 1) = pos
      tt += 1
    }
    // backtrack: chain = [n, cp(n), cp(cp(n)), ...] until 0, then sort
    val chain = scala.collection.mutable.ArrayBuffer[Int](n)
    var last = n
    while (last > 0) { last = cp(last - 1); chain += last }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      chain.toArray.sorted.map(Int.box))
  }
}

case class PeltBreakpoints(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def prettyName: String = "pelt_breakpoints"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, false)

  override def checkInputDataTypes(): TypeCheckResult = {
    def okArr(dt: DataType): Boolean = dt match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }
    if (okArr(first.dataType) && okArr(second.dataType) &&
      third.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>, double), got " +
        s"${first.dataType.catalogString}/${second.dataType.catalogString}/${third.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    PeltUtil.breakpoints(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      c.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.PeltUtil.breakpoints($a, $b, $c)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Gopher-repetition statistics over a token array in ONE native pass
  * — the declarative form materialized a bigram array (interpreted
  * transform + concat_ws per gram), array_sort'ed it, ran an
  * interpreted fold for the max run, and built a second trigram array
  * plus two array_distinct probes: five interpreted O(tokens)
  * walks per document on the corpus-filter hot path. This kernel
  * computes the same five exact integers in one walk with hash
  * multiset/set probes; the fractional forms are composed outside
  * with the identical round/when arithmetic.
  *
  * Exactness: token equality is UTF8 binary equality (the same
  * equality split-produced strings compare under); a bigram/trigram
  * as a (t_i, t_{i+1}[, t_{i+2}]) tuple is equal iff the space-joined
  * string is equal, because whitespace-split tokens contain no
  * spaces; max-run-length over a sorted multiset IS the max
  * multiplicity. Assumes non-null elements (split never yields null).
  */
object RepStatsUtil {
  def stats(toks: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    var i = 0
    while (i < n) { seen.add(toks.getUTF8String(i)); i += 1 }
    var maxBi = 0L
    if (n >= 2) {
      val bi = new java.util.HashMap[(UTF8String, UTF8String), Long](n * 2)
      i = 0
      while (i < n - 1) {
        val k = (toks.getUTF8String(i), toks.getUTF8String(i + 1))
        val c = bi.merge(k, 1L, (a, b) => a + b)
        if (c > maxBi) maxBi = c
        i += 1
      }
    }
    var nTri = 0L
    var nTriDistinct = 0L
    if (n >= 3) {
      nTri = (n - 2).toLong
      val tri = new java.util.HashSet[(UTF8String, UTF8String, UTF8String)](n * 2)
      i = 0
      while (i < n - 2) {
        tri.add((toks.getUTF8String(i), toks.getUTF8String(i + 1), toks.getUTF8String(i + 2)))
        i += 1
      }
      nTriDistinct = tri.size.toLong
    }
    // n == 2 edge: ONE bigram → max multiplicity 1, matching the
    // maxRunLength(size<=1 → size) branch of the declarative form
    InternalRow(n.toLong, seen.size.toLong, maxBi, nTri, nTriDistinct)
  }
}

case class RepStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "rep_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("n_distinct", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("max_bigram", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("n_tri", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("n_tri_distinct", org.apache.spark.sql.types.LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepStatsUtil.stats(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepStatsUtil.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of array elements contained in a FIXED word set — the
  * stopword / language-profile membership counter. The declarative
  * form (`size(filter(toks, t => t.isin(words)))`) runs an
  * interpreted lambda with an O(|words|) In-list probe per token AND
  * allocates the filtered array; this is one compiled walk over a
  * shared hash set. Null elements count as non-members (isin's null
  * is not TRUE under filter). Matching binary UTF8 equality.
  */
object TokenSetHitsUtil {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Seq[String], java.util.HashSet[UTF8String]]()
  def setOf(words: Seq[String]): java.util.HashSet[UTF8String] =
    cache.computeIfAbsent(words, ws => {
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    })
  def hits(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      set: java.util.HashSet[UTF8String]): Long = {
    val n = toks.numElements()
    var i = 0
    var c = 0L
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) c += 1L
      i += 1
    }
    c
  }
}

case class TokenSetHits(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def prettyName: String = "token_set_hits"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val set = TokenSetHitsUtil.setOf(words)

  override protected def nullSafeEval(input: Any): Any =
    TokenSetHitsUtil.hits(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // embed the built set as a plan reference object (serialized with
    // the plan, shared across rows — the standard driver-object splice)
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSetHitsUtil.hits($c, $setRef)")
  }

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

  def compressSize(c: Column): Column =
    bridge.column(CompressSize(bridge.expression(c)))

  def jaroWinkler(l: Column, r: Column): Column =
    bridge.column(JaroWinkler(bridge.expression(l), bridge.expression(r)))

  def lcsLen(a: Column, b: Column): Column =
    bridge.column(LcsLen(bridge.expression(a), bridge.expression(b)))

  def dtwLong(a: Column, b: Column): Column =
    bridge.column(DtwLong(bridge.expression(a), bridge.expression(b)))

  def peltBreakpoints(s0: Column, ss0: Column, bq: Column): Column =
    bridge.column(PeltBreakpoints(bridge.expression(s0), bridge.expression(ss0),
      bridge.expression(bq)))

  def repStats(toks: Column): Column =
    bridge.column(RepStats(bridge.expression(toks)))

  def tokenSetHits(toks: Column, words: Seq[String]): Column =
    bridge.column(TokenSetHits(bridge.expression(toks), words))
}
