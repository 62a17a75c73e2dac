package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k (score, id) pairs with the
  * highest score (ties → smaller id wins), as a min-heap keyed by
  * eviction order.
  */
final class TopKBuffer(val k: Int) {
  // head = next to evict = lowest score, then LARGEST id (so that for
  // equal scores the smaller id survives)
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (s, -i) }
  val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord.reverse)

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (ord.gt((score, id), heap.head)) { heap.dequeue(); heap.enqueue((score, id)) }
  }

  def merge(other: TopKBuffer): Unit = other.heap.foreach { case (s, i) => add(s, i) }

  /** Descending score, ascending id — the ranked result. */
  def sorted: Seq[(Double, Long)] = heap.toSeq.sortBy { case (s, i) => (-s, i) }
}

/** `top_k_by(score, id, k)` — a TypedImperativeAggregate returning
  * `array<struct<id, score, rank>>` of the k highest-scoring rows.
  *
  * The point at scale: partial aggregation keeps at most k entries
  * per group PER MAP TASK, so a brute-force similarity scan shuffles
  * O(partitions·k) rows per query instead of the full |corpus| —
  * the window/row_number formulation funnels every scored row into
  * |queries| reducers (skewed, unbounded) before discarding all but
  * k. Same result, bounded memory, one balanced shuffle.
  */
/** Long-score twin of [[TopKBuffer]]: exact integer comparisons, no
  * double rounding — for scores derived from integer-unit arithmetic
  * (quantized distances, counts) that can exceed 2^53.
  */
final class TopKLongBuffer(val k: Int) {
  private val ord: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), (Long, Long)] { case (s, i) => (s, -i) }
  val heap = new scala.collection.mutable.PriorityQueue[(Long, Long)]()(ord.reverse)

  def add(score: Long, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (ord.gt((score, id), heap.head)) { heap.dequeue(); heap.enqueue((score, id)) }
  }

  def merge(other: TopKLongBuffer): Unit = other.heap.foreach { case (s, i) => add(s, i) }

  def sorted: Seq[(Long, Long)] = heap.toSeq.sortBy { case (s, i) => (-s, i) }
}

/** `top_k_by_long(score, id, k)` — the BIGINT-score variant of
  * [[TopKByScore]]: identical heap/tie semantics, but scores compare
  * as exact longs. Use when the score is an exact integer quantity
  * (e.g. a negated squared integer-unit distance) that may exceed
  * 2^53 — a double-cast there can merge distinct scores and let the
  * id tie-break pick a different row than an exact integer ORDER BY.
  */
case class TopKByScoreLong(scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKLongBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", LongType),
    StructField("rank", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == LongType && idExpr.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_long requires (bigint, bigint) inputs and k > 0, got " +
        s"(${scoreExpr.dataType.catalogString}, ${idExpr.dataType.catalogString}, $k)")

  override def createAggregationBuffer(): TopKLongBuffer = new TopKLongBuffer(k)

  override def update(buf: TopKLongBuffer, input: InternalRow): TopKLongBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) buf.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKLongBuffer, b: TopKLongBuffer): TopKLongBuffer = { a.merge(b); a }

  override def eval(buf: TopKLongBuffer): Any = {
    val rows = buf.sorted.zipWithIndex.map { case ((s, i), r) =>
      InternalRow(i, s, (r + 1).toLong)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: TopKLongBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.heap.toSeq
    out.writeInt(buf.k); out.writeInt(items.size)
    items.foreach { case (s, i) => out.writeLong(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKLongBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKLongBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readLong(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScoreLong = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScoreLong = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = c(0), idExpr = c(1))
  override def prettyName: String = "top_k_by_long"
}

case class TopKByScore(scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType),
    StructField("rank", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by requires (double, bigint) inputs and k > 0, got " +
        s"(${scoreExpr.dataType.catalogString}, ${idExpr.dataType.catalogString}, $k)")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.merge(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val rows = buf.sorted.zipWithIndex.map { case ((s, i), r) =>
      InternalRow(i, s, (r + 1).toLong)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.heap.toSeq
    out.writeInt(buf.k); out.writeInt(items.size)
    items.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = c(0), idExpr = c(1))
  override def prettyName: String = "top_k_by"
}
