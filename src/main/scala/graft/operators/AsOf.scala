package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the payload
  * of the nearest right row with the same key at-or-before (backward)
  * or at-or-after (forward) the left row's time, optionally within a
  * tolerance. Spark has no native ASOF JOIN; the naive formulations
  * are a range join (O(n·m) candidate explosion) or a per-key loop.
  *
  * This implementation is the union-merge form: tag both sides, union,
  * and carry the last non-null payload forward with a window — ONE
  * hash shuffle on the key + one per-partition sort, the same cost
  * shape as any windowed aggregation, and no pair explosion at any
  * scale. Right rows sort before left rows at equal timestamps, so
  * the match is inclusive (ts_right == ts_left matches) in both
  * directions. Forward direction is the same plan with the time order
  * reversed; tolerance carries the matched timestamp through the
  * window and nulls the payload when the gap exceeds it.
  *
  * `right` must be unique per (key, time) — pre-aggregate if not —
  * otherwise the carried payload would depend on shuffle order.
  */
object AsOf {

  def lastValueAsOf(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      payload: Column, payloadName: String,
      direction: String = "backward", toleranceMs: Long = 0L): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    // wrap payload with its own event time so tolerance can compare
    val wrapped = struct(col(rightTime).cast("timestamp").as("__mt"), payload.as("__v"))
    val pType = right.select(wrapped.as("__p")).schema("__p").dataType
    val rowType = org.apache.spark.sql.types.StructType(left.schema.fields)

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      lit(null).cast(pType).as("__p"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__row"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      wrapped.as("__p"),
      lit(null).cast(rowType).as("__row"))

    val timeOrd = if (direction == "forward") col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(timeOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withinTol: Column =
      if (toleranceMs <= 0L) col("__m").isNotNull
      else col("__m").isNotNull &&
        abs(unix_millis(col("__t")) - unix_millis(col("__m.__mt"))) <= toleranceMs

    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(c => col(s"__row.$c").as(c)) :+
        when(withinTol, col("__m.__v")).as(payloadName)).toIndexedSeq: _*)
  }

  /** Native as-of join through the custom Catalyst operator
    * (graft.plans.AsOfJoin → AsOfJoinExec): attaches ALL right
    * columns (prefixed `rightPrefix`) of the latest right row
    * at-or-before (backward) / earliest at-or-after (forward) each
    * left row's time, same key, optional tolerance — nulls when no
    * match. Same semantics as [[lastValueAsOf]] (inclusive ties),
    * different physical plan: each side shuffles on its own key and
    * sorts locally, then one streaming merge pass per partition —
    * no union row-widening, no window state. See AsOfJoinPlan.scala.
    *
    * `right` must be unique per (key, time) — same contract as
    * [[lastValueAsOf]]. Right rows with null key/time are dropped
    * (unmatchable by definition); left rows with null key/time come
    * through with a null match (the exec also enforces both rules).
    */
  def nativeAsOf(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightPrefix: String = "r_",
      direction: String = "backward", toleranceMs: Long = 0L): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    // Internal columns and the prefixed right columns land in one
    // namespace with the left columns — collisions would resolve to
    // the wrong attribute (or fail analysis with an ambiguity error
    // far from the cause), so reject them up front.
    val reserved = Set("__lk", "__lt", "__rk", "__rt")
    require(!left.columns.exists(reserved), s"left columns collide with " +
      s"reserved as-of names: ${left.columns.filter(reserved).mkString(", ")}")
    require(!right.columns.exists(reserved), s"right columns collide with " +
      s"reserved as-of names: ${right.columns.filter(reserved).mkString(", ")}")
    val prefixed = right.columns.map(rightPrefix + _)
    require(!prefixed.exists(reserved), s"rightPrefix '$rightPrefix' produces " +
      s"reserved names: ${prefixed.filter(reserved).mkString(", ")}")
    val clash = prefixed.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"rightPrefix '$rightPrefix' collides with left " +
      s"columns: ${clash.mkString(", ")} — pass a different rightPrefix")
    val sign = if (direction == "forward") -1L else 1L
    // sign-adjusted epoch-millis time attrs for the exec's
    // "at-or-before on ascending longs" merge
    val l2 = left.select(
      (col(leftKey).as("__lk") +:
        (unix_millis(col(leftTime).cast("timestamp")) * sign).as("__lt") +:
        left.columns.map(col).toIndexedSeq): _*)
    val r2 = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        (col(rightKey).as("__rk") +:
          (unix_millis(col(rightTime).cast("timestamp")) * sign).as("__rt") +:
          right.columns.map(c => col(c).as(s"$rightPrefix$c")).toIndexedSeq): _*)
    val spark = left.sparkSession
    graft.plans.AsOfJoinPlan.dataFrame(spark,
        l2.queryExecution.analyzed, r2.queryExecution.analyzed,
        "__lk", "__lt", "__rk", "__rt", toleranceMs)
      .select((left.columns.map(col) ++
        right.columns.map(c => col(s"$rightPrefix$c"))).toIndexedSeq: _*)
  }
}
