package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distributed generalized-linear-model training as moment
  * aggregation: each Newton/IRLS iteration is ONE partial-aggregated
  * pass over the data computing the gradient and Hessian sums, and
  * the (tiny, fixed-dimension) solve rides the 1-row aggregate frame
  * — no driver-side data movement, no per-row state. This is the
  * canonical Spark shape for GLM fitting: at 100 TB an iteration
  * costs exactly one scan + one 5-number reduce.
  */
object Glm {

  /** Logistic regression y ~ sigmoid(b0 + b1·x) fit by `iters` Newton
    * (IRLS) steps from β = 0. Returns a 1-row frame
    * (n, b0, b1) with coefficients rounded to 6 decimals.
    *
    * Determinism: per-row gradient/Hessian contributions are
    * quantized to integer 1e-9 units (floor(v·1e9 + 0.5)) so the
    * five moment sums are exact BIGINTs (order-independent), and β
    * itself is re-quantized to the 1e-9 grid after every update —
    * each iteration therefore starts from bit-identical inputs on
    * any engine, so exp()'s last-ulp platform differences cannot
    * compound across iterations.
    */
  def logitIrls(df: DataFrame, y: Column, x: Column, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(y.cast(DoubleType).as("y"), x.cast(DoubleType).as("x"))
      .persist() // scanned once per iteration
    var beta = spark.range(1).select(lit(0.0).as("b0"), lit(0.0).as("b1"))
    val U = lit(1.0e9)
    for (_ <- 1 to iters) {
      val t = col("b0") + col("b1") * col("x")
      val p = lit(1.0) / (lit(1.0) + exp(-t))
      val w = p * (lit(1.0) - p)
      val r = col("y") - p
      val m = base.crossJoin(broadcast(beta)).agg(
        sum(floor(r * U + lit(0.5))).as("g0u"),
        sum(floor(col("x") * r * U + lit(0.5))).as("g1u"),
        sum(floor(w * U + lit(0.5))).as("h00u"),
        sum(floor(col("x") * w * U + lit(0.5))).as("h01u"),
        sum(floor(col("x") * col("x") * w * U + lit(0.5))).as("h11u"),
        max(col("b0")).as("pb0"), max(col("b1")).as("pb1"))
      val G0 = col("g0u").cast(DoubleType) / U
      val G1 = col("g1u").cast(DoubleType) / U
      val H00 = col("h00u").cast(DoubleType) / U
      val H01 = col("h01u").cast(DoubleType) / U
      val H11 = col("h11u").cast(DoubleType) / U
      val det = H00 * H11 - H01 * H01
      // singular Hessian (constant x, or weights driven to 0 by
      // separation): keep the previous beta instead of dividing by 0
      // and silently propagating NaN through every later iteration
      beta = m.select(
          when(det =!= lit(0.0),
            floor((col("pb0") + (G0 * H11 - G1 * H01) / det) * U + lit(0.5)) / U)
            .otherwise(col("pb0")).as("b0"),
          when(det =!= lit(0.0),
            floor((col("pb1") + (G1 * H00 - G0 * H01) / det) * U + lit(0.5)) / U)
            .otherwise(col("pb1")).as("b1"))
        .localCheckpoint(true) // single consumer; keeps the plan O(1)-deep
    }
    val out = base.crossJoin(broadcast(beta))
      .agg(count(lit(1)).as("n"),
        round(max(col("b0")), 6).as("b0"), round(max(col("b1")), 6).as("b1"))
    base.unpersist()
    out
  }
}
