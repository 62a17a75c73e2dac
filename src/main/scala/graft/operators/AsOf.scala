package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the payload
  * of the latest right row with the same key and time ≤ the left
  * row's time. Spark has no native ASOF JOIN; the naive formulations
  * are a range join (O(n·m) candidate explosion) or a per-key loop.
  *
  * This implementation is the union-merge form: tag both sides, union,
  * and carry the last non-null payload forward with a window — ONE
  * hash shuffle on the key + one per-partition sort, the same cost
  * shape as any windowed aggregation, and no pair explosion at any
  * scale. Right rows sort before left rows at equal timestamps, so
  * the match is inclusive (ts_right == ts_left matches).
  *
  * `right` must be unique per (key, time) — pre-aggregate if not —
  * otherwise the carried payload would depend on shuffle order.
  */
object AsOf {

  def lastValueAsOf(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      payload: Column, payloadName: String): DataFrame = {
    val pType = right.select(payload.as("__p")).schema("__p").dataType
    val rowType = org.apache.spark.sql.types.StructType(left.schema.fields)

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      lit(null).cast(pType).as("__p"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__row"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      payload.as("__p"),
      lit(null).cast(rowType).as("__row"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(c => col(s"__row.$c").as(c)) :+
        col("__asof").as(payloadName)).toIndexedSeq: _*)
  }
}
