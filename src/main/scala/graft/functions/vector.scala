package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Vector math over `array<float>` / `array<double>` embedding
  * columns. The primary entry points build native Catalyst
  * expressions (see [[DotProduct]] / [[CosineSimilarity]]) — a fused
  * primitive loop inside whole-stage codegen. The `*Hof` variants are
  * the declarative higher-order-function formulation kept as a
  * reference implementation (interpreted, ~10× slower in a hot scan)
  * and for differential testing.
  */
object vector {

  private def expr2(a: Column, b: Column,
      f: (org.apache.spark.sql.catalyst.expressions.Expression,
          org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression): Column =
    bridge.column(f(bridge.expression(a), bridge.expression(b)))

  /** dot(a, b) with double accumulation (native codegen). */
  def dot(a: Column, b: Column): Column = expr2(a, b, DotProduct)

  /** Bounded top-k aggregate: k highest `score` rows per group (ties →
    * smaller id), as array<struct<id, score, rank>>. Map-side partials
    * hold ≤ k entries, so a similarity scan shuffles O(partitions·k)
    * rows per group instead of the whole corpus.
    */
  def topKBy(score: Column, id: Column, k: Int): Column =
    bridge.column(TopKByScore(bridge.expression(score), bridge.expression(id), k)
      .toAggregateExpression())

  /** BIGINT-score twin of [[topKBy]]: exact integer comparisons for
    * scores (quantized distances, counts) that may exceed 2^53, where
    * a double cast could merge distinct scores and corrupt the id
    * tie-break.
    */
  def topKByLong(score: Column, id: Column, k: Int): Column =
    bridge.column(TopKByScoreLong(bridge.expression(score), bridge.expression(id), k)
      .toAggregateExpression())

  /** Cosine similarity; null on zero vector / length mismatch (native codegen). */
  def cosine(a: Column, b: Column): Column = expr2(a, b, CosineSimilarity)

  /** Exact integer squared L2 distance over array<bigint> (native
    * codegen): Σ (aᵢ−bᵢ)² in long arithmetic — the quantized-unit
    * distance of the kNN/DBSCAN family. Bit-identical to the
    * interpreted `aggregate(zip_with(...))` form ([[sqdistLongHof]])
    * whenever the sum fits a long, which the 1e-7 quantization
    * convention guarantees.
    */
  def sqdistLong(a: Column, b: Column): Column = expr2(a, b, SqDistLong)

  /** Mergeable bloom-filter sketch over a BIGINT key (see [[BloomAgg]]):
    * fixed-size bit-array partials OR-merge, output is the serialized
    * sketch binary.
    */
  def bloomAgg(key: Column, numBits: Int, numHashes: Int): Column =
    bridge.column(BloomAgg(bridge.expression(key), numBits, numHashes)
      .toAggregateExpression())

  /** Probe a [[bloomAgg]] sketch: false ⇒ definitely absent. */
  def bloomMightContain(sketch: Column, key: Column): Column =
    expr2(sketch, key, BloomMightContain)

  /** Mergeable VarOpt weighted-sampling sketch (see [[VarOptAgg]]):
    * bounded k-item weighted sample with unbiased subset sums.
    */
  def varoptAgg(item: Column, weight: Column, k: Int): Column =
    bridge.column(VarOptAgg(bridge.expression(item), bridge.expression(weight), k)
      .toAggregateExpression())

  /** Explode a [[varoptAgg]] binary to (item, adjusted-weight) rows. */
  def varoptSamples(sketch: Column): Column =
    bridge.column(VarOptSamples(bridge.expression(sketch)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** l2 distance (composed from codegen'd dots: ‖a-b‖² = aa - 2ab + bb). */
  def l2(a: Column, b: Column): Column =
    sqrt(greatest(dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b), lit(0.0)))

  // ── reference HOF implementations (interpreted; for differential tests) ──

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  def cosineHof(a: Column, b: Column): Column = {
    val d  = dotHof(a, b)
    val nn = normHof(a) * normHof(b)
    when(nn =!= 0.0, d / nn)
  }

  /** Reference interpreted form of [[sqdistLong]] (differential tests). */
  def sqdistLongHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Exact elementwise l2 (one pass HOF; reference). */
  def l2Hof(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v))
}
