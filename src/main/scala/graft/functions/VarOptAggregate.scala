package graft.functions

import org.apache.datasketches.common.ArrayOfLongsSerDe
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.sampling.{VarOptItemsSketch, VarOptItemsUnion}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `varopt_agg(item, weight, k)` — mergeable VarOpt weighted-sampling
  * sketch (Cohen et al.; DataSketches) over a BIGINT item with a
  * positive DOUBLE weight. The SAMPLING member of the sketch family
  * (HLL counts, KLL quantiles, CMS frequencies, theta set algebra,
  * bloom membership): a bounded k-item weighted sample whose
  * inclusion-adjusted weights give UNBIASED subset-sum estimates with
  * near-optimal variance — "estimate any segment's revenue from one
  * 256-row sample" — and, unlike the A-Res reservoir
  * (Curation.weightedSample), the sketch MERGES: per-partition
  * partials are O(k) and union at combine time, so the shuffle is
  * O(partitions·k) at any data size, and per-day sketches roll up to
  * per-month ones without touching rows again.
  *
  * Output is the serialized sketch binary (ArrayOfLongsSerDe layout —
  * readable by any DataSketches runtime); [[VarOptSamples]] explodes
  * it back to (item, adjusted weight) rows.
  */
case class VarOptAgg(itemExpr: Expression, weightExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VarOptItemsSketch[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(itemExpr, weightExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (itemExpr.dataType == LongType && weightExpr.dataType == DoubleType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"varopt_agg requires (bigint item, double weight, k > 0), got " +
        s"(${itemExpr.dataType.catalogString}, ${weightExpr.dataType.catalogString}, k=$k)")

  override def createAggregationBuffer(): VarOptItemsSketch[java.lang.Long] =
    VarOptItemsSketch.newInstance[java.lang.Long](k)

  override def update(buf: VarOptItemsSketch[java.lang.Long],
      input: InternalRow): VarOptItemsSketch[java.lang.Long] = {
    val item = itemExpr.eval(input)
    val w = weightExpr.eval(input)
    // null item/weight and ZERO weight rows contribute nothing (a zero
    // weight can never be sampled). A NEGATIVE weight is a caller bug:
    // silently skipping it would bias every subset-sum estimate, so it
    // fails loudly here — the same contract VarOpt itself enforces.
    if (item != null && w != null) {
      val wd = w.asInstanceOf[Double]
      if (wd < 0.0) throw new IllegalArgumentException(
        s"varopt_agg: negative weight $wd for item $item — weights must be >= 0")
      if (wd > 0.0) buf.update(item.asInstanceOf[Long], wd)
    }
    buf
  }

  override def merge(a: VarOptItemsSketch[java.lang.Long],
      b: VarOptItemsSketch[java.lang.Long]): VarOptItemsSketch[java.lang.Long] = {
    val u = VarOptItemsUnion.newInstance[java.lang.Long](k)
    u.update(a); u.update(b)
    u.getResult
  }

  override def eval(buf: VarOptItemsSketch[java.lang.Long]): Any = serialize(buf)

  override def serialize(buf: VarOptItemsSketch[java.lang.Long]): Array[Byte] =
    buf.toByteArray(new ArrayOfLongsSerDe)

  override def deserialize(bytes: Array[Byte]): VarOptItemsSketch[java.lang.Long] =
    VarOptItemsSketch.heapify(Memory.wrap(bytes), new ArrayOfLongsSerDe)

  override def withNewMutableAggBufferOffset(o: Int): VarOptAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VarOptAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(itemExpr = c(0), weightExpr = c(1))
  override def prettyName: String = "varopt_agg"
}

/** `varopt_samples(sketch)` — explode a [[VarOptAgg]] binary back to
  * its `array<struct<item bigint, weight double>>` sample rows. The
  * weights are the INCLUSION-ADJUSTED ones: Σ weights over any item
  * subset is an unbiased estimate of that subset's true weight sum
  * (and over ALL samples equals the exact input total). Interpreted
  * (CodegenFallback) — it runs once per sketch row, never on a fact
  * scan.
  */
case class VarOptSamples(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(new StructType()
    .add("item", LongType, nullable = false)
    .add("weight", DoubleType, nullable = false), containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"varopt_samples requires binary, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(bytes: Any): Any = {
    val sk = VarOptItemsSketch.heapify(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]]), new ArrayOfLongsSerDe)
    val samples = sk.getSketchSamples
    val items = samples.items()
    val weights = samples.weights()
    val out = new Array[Any](samples.getNumSamples)
    var i = 0
    while (i < out.length) {
      out(i) = InternalRow(items(i).longValue(), weights(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "varopt_samples"
}
