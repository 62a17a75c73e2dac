package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Band/range joins done the scalable way. A plain inequality join
  * (`a.t BETWEEN b.t - δ AND b.t`) has no equi-key, so Spark executes
  * it as a broadcast-nested-loop — O(n·m) compares and a broadcast of
  * a whole side. Bucketing time into δ-wide bins and replicating the
  * right side into (bin, bin+1) turns it into an equi-join on
  * (key, bin) whose candidate set is only the true matches plus
  * near-misses inside one bin width — shuffle-partitioned, no
  * broadcast, linear in the data at any scale.
  */
object RangeJoin {

  /** Per left row: count and value-sum of right rows with the same
    * key STRICTLY before it and within `delayUs` microseconds.
    * Left rows with no matches get (0, 0.0).
    *
    * Money-grade determinism: the value sum goes through
    * DECIMAL(12,2) so the result is partitioning-independent.
    */
  def priorAggWithin(left: DataFrame, right: DataFrame,
      key: String, id: String, leftTs: String, rightTs: String,
      value: String, delayUs: Long): DataFrame = {
    val a = left.select(col(key).as("k"), col(id).as("id"),
      unix_micros(col(leftTs)).as("tu"))
      .withColumn("bkt", expr(s"tu div $delayUs"))
    val b = right.select(col(key).as("k"),
      unix_micros(col(rightTs)).as("tu_r"),
      col(value).cast(DecimalType(12, 2)).as("v"))
      .withColumn("bkt0", expr(s"tu_r div $delayUs"))
      .select(col("k"), col("tu_r"), col("v"),
        explode(array(col("bkt0"), col("bkt0") + 1L)).as("bkt"))
    val matched = a.join(b, Seq("k", "bkt"))
      .filter(col("tu_r") < col("tu") && col("tu") - col("tu_r") <= delayUs)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_prior"),
        sum(col("v")).cast(DoubleType).as("prior_value"))
    left.select(col(id).as("id"))
      .join(matched, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_prior"), lit(0L)).as("n_prior"),
        coalesce(col("prior_value"), lit(0.0)).as("prior_value"))
  }

  /** General banded equi-candidates: (left, right) row pairs with the
    * same key and |t_l − t_r| ≤ δ — the building block when the caller
    * wants the pairs themselves. Strictness/direction filters compose
    * on top.
    */
  def bandCandidates(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String, delayUs: Long,
      leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    val a = left
      .select((Seq(col(key).as("k"), unix_micros(col(leftTs)).as("tu")) ++ leftCols.map(col)): _*)
      .withColumn("bkt0", expr(s"tu div $delayUs"))
      .withColumn("bkt", explode(array(col("bkt0") - 1L, col("bkt0"), col("bkt0") + 1L)))
      .drop("bkt0")
    val b = right
      .select((Seq(col(key).as("k"), unix_micros(col(rightTs)).as("tu_r")) ++ rightCols.map(col)): _*)
      .withColumn("bkt", expr(s"tu_r div $delayUs"))
    a.join(b, Seq("k", "bkt"))
      .filter(abs(col("tu") - col("tu_r")) <= delayUs)
      .drop("bkt")
  }
}
