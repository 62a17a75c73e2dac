package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static bloom helpers shared by the aggregate, the probe expression
  * and its generated code. Hashing is splitmix64 double-hashing
  * (h1 + j·h2 over the bit space) — a pure function of the key, so
  * sketches built anywhere (any partitioning, any engine embedding
  * this code) are bit-identical and OR-mergeable.
  *
  * Serialized layout: [numBits int][numHashes int][bit bytes].
  */
object BloomProbe {
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bit position of probe j for `key` in a `numBits`-bit filter. */
  @inline def bitPos(key: Long, j: Int, numBits: Int): Int = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x6a09e667f3bcc909L) | 1L
    val h = h1 + j.toLong * h2
    ((h % numBits + numBits) % numBits).toInt
  }

  def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Probe a serialized sketch — O(numHashes), zero allocation. */
  def mightContain(sketch: Array[Byte], key: Long): Boolean = {
    val numBits = readInt(sketch, 0)
    val numHashes = readInt(sketch, 4)
    var j = 0
    while (j < numHashes) {
      val p = bitPos(key, j, numBits)
      if ((sketch(8 + (p >> 3)) & (1 << (p & 7))) == 0) return false
      j += 1
    }
    true
  }
}

/** Mutable bloom state: a bit array + params. Merge = bitwise OR. */
final class BloomBuffer(val numBits: Int, val numHashes: Int) {
  val bits = new Array[Byte]((numBits + 7) / 8)

  def add(key: Long): Unit = {
    var j = 0
    while (j < numHashes) {
      val p = BloomProbe.bitPos(key, j, numBits)
      bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte
      j += 1
    }
  }

  /** Probe without serializing — for stateful-stream consumers. */
  def contains(key: Long): Boolean = {
    var j = 0
    while (j < numHashes) {
      val p = BloomProbe.bitPos(key, j, numBits)
      if ((bits(p >> 3) & (1 << (p & 7))) == 0) return false
      j += 1
    }
    true
  }

  def or(other: BloomBuffer): Unit = {
    var i = 0
    while (i < bits.length) { bits(i) = (bits(i) | other.bits(i)).toByte; i += 1 }
  }

  def serialize(): Array[Byte] = {
    val out = new Array[Byte](8 + bits.length)
    out(0) = (numBits >> 24).toByte; out(1) = (numBits >> 16).toByte
    out(2) = (numBits >> 8).toByte; out(3) = numBits.toByte
    out(4) = (numHashes >> 24).toByte; out(5) = (numHashes >> 16).toByte
    out(6) = (numHashes >> 8).toByte; out(7) = numHashes.toByte
    System.arraycopy(bits, 0, out, 8, bits.length)
    out
  }
}

object BloomBuffer {
  def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val buf = new BloomBuffer(BloomProbe.readInt(bytes, 0), BloomProbe.readInt(bytes, 4))
    System.arraycopy(bytes, 8, buf.bits, 0, buf.bits.length)
    buf
  }
}

/** `bloom_agg(key, numBits, numHashes)` — mergeable bloom-filter
  * sketch over a BIGINT key column, returned as the serialized bit
  * array. The MEMBERSHIP member of the sketch family (HLL counts,
  * KLL quantiles, CMS frequencies, theta set-algebra): per-partition
  * partials are fixed-size bit arrays OR-merged at combine time, so
  * the shuffle carries O(partitions · numBits/8) bytes however large
  * the build side — the portable form of Spark's internal runtime
  * bloom join filter, persistable and probe-able from any session.
  */
case class BloomAgg(keyExpr: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] {

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (keyExpr.dataType == LongType && numBits > 0 && numHashes > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a bigint key and positive params, got " +
        s"${keyExpr.dataType.catalogString}, bits=$numBits, hashes=$numHashes")

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(numBits, numHashes)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val k = keyExpr.eval(input)
    if (k != null) buf.add(k.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomBuffer, b: BloomBuffer): BloomBuffer = { a.or(b); a }

  override def eval(buf: BloomBuffer): Any = buf.serialize()

  override def serialize(buf: BloomBuffer): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): BloomBuffer = BloomBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(keyExpr = c(0))
  override def prettyName: String = "bloom_agg"
}

/** `bloom_might_contain(sketch, key)` — probe a [[BloomAgg]] sketch.
  * False ⇒ definitely absent (no false negatives); true ⇒ present
  * with FPR ≈ (1 − e^{−kn/m})^k. Codegen'd as a static call so the
  * probe stays inside whole-stage codegen on the fact-scan hot path.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires (binary, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    BloomProbe.mightContain(sketch.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, k) =>
      s"graft.functions.BloomProbe.mightContain($sk, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}
