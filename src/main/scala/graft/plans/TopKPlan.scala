package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, BindReferences, Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.functions.col

/** Whole-operator top-k-per-group as a first-class Catalyst citizen —
  * the second tier-(c) extension beside [[AsOfJoin]]. The built-in
  * way to keep the k best rows per group is a Window row_number +
  * filter, which SORTS every group's every row inside each partition;
  * this operator instead keeps a bounded k-element heap per group in
  * ONE pass — O(n log k) time, O(groups·k) memory, no sort buffer,
  * and rows beyond k never survive the pass.
  *
  * Semantics: the k rows with the LARGEST `ord` value per group; rows
  * with a null `ord` are dropped (they can never rank). Callers
  * encode direction and tie-breaks in `ord` itself (e.g.
  * `struct(price, -key)` = price desc, key asc — struct ordering is
  * field-by-field), the same contract as `functions.top_k_by`; unlike
  * that aggregate this operator returns the FULL ROWS.
  *
  * The ord column is carried as a resolved child attribute so it
  * flows into `references` and survives column pruning; the exec
  * declares `ClusteredDistribution(group)` and lets
  * EnsureRequirements insert the single hash exchange — AQE and
  * reuse work unchanged.
  */
final case class GroupedTopK(child: LogicalPlan,
    groupCols: Seq[Attribute], ordCol: Attribute, k: Int,
    keepSmallest: Boolean = false) extends UnaryNode {
  require(groupCols.nonEmpty,
    "GroupedTopK needs group columns: ClusteredDistribution(Nil) cannot be planned")
  override def output: Seq[Attribute] = child.output
  override def references: AttributeSet =
    AttributeSet((groupCols :+ ordCol).flatMap(_.references))
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

final case class GroupedTopKExec(child: SparkPlan,
    groupCols: Seq[Expression], ordCol: Expression, k: Int,
    keepSmallest: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupCols, requireAllClusterKeys = false, None))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val kk = k
    val boundGroups = groupCols.map(BindReferences.bindReference(_, childOut))
    val boundOrd = BindReferences.bindReference(ordCol, childOut)
    val ordType = ordCol.dataType
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(boundGroups, childOut)
      val ordProj = UnsafeProjection.create(Seq(boundOrd), childOut)
      val natural = RowOrdering.createNaturalAscendingOrdering(Seq(ordType))
      // "best" compares HIGHER for rows we prefer; keepSmallest flips it
      val ordAsc = if (keepSmallest) natural.reverse else natural
      // scala PriorityQueue is a max-heap for its ordering; reverse it
      // so the HEAD is the current k-th (smallest retained) value
      val heapOrd = Ordering.by[(UnsafeRow, InternalRow), UnsafeRow](_._1)(
        ordAsc.asInstanceOf[Ordering[UnsafeRow]]).reverse
      val groups = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[(UnsafeRow, InternalRow)]]
      while (iter.hasNext) {
        val row = iter.next()
        val ordRow = ordProj(row)
        if (!ordRow.isNullAt(0)) {
          val key = groupProj(row)
          groups.get(key) match {
            case Some(heap) =>
              if (heap.size < kk) heap.enqueue((ordRow.copy(), row.copy()))
              else if (ordAsc.compare(ordRow, heap.head._1) > 0) {
                heap.dequeue(); heap.enqueue((ordRow.copy(), row.copy()))
              }
            case None =>
              val heap = scala.collection.mutable.PriorityQueue
                .empty[(UnsafeRow, InternalRow)](heapOrd)
              heap.enqueue((ordRow.copy(), row.copy()))
              groups.put(key.copy(), heap)
          }
        }
      }
      // emit each group's survivors largest-first (deterministic local
      // order; global order is the caller's ORDER BY)
      groups.valuesIterator.flatMap { heap =>
        heap.dequeueAll.reverseIterator.map(
          (e: (UnsafeRow, InternalRow)) => e._2)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

/** Bridge: build the DataFrame form. `ord` is evaluated into a
  * temporary column so arbitrary expressions (struct tie-breaks,
  * negations) resolve through the normal analyzer before the node is
  * constructed; the column is dropped on the way out.
  */
object TopKPlan {
  private val OrdCol = "_graft_topk_ord"

  def topKPerGroup(df: DataFrame, groupCols: Seq[String], ord: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // ClusteredDistribution(Nil) is rejected at planning; a global
    // (ungrouped) top-k is just orderBy+limit — don't route it here
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    val spark: SparkSession = df.sparkSession
    val tagged = df.withColumn(OrdCol, ord)
    val plan = tagged.queryExecution.analyzed
    def attr(n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${plan.output.map(_.name)}"))
    org.apache.spark.sql.graft.DatasetBridge.ofRows(spark,
      GroupedTopK(plan, groupCols.map(attr), attr(OrdCol), k)).drop(col(OrdCol))
  }
}
