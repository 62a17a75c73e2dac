package graft

import graft.operators.Glm
import org.apache.spark.sql.functions._

class GlmSpec extends SparkSpec {

  test("logitIrls: recovers the sign/rough scale of a known separator") {
    import spark.implicits._
    // y = 1 iff x > 0 with some noise-free margin: b1 must come out
    // strongly positive, b0 near the midpoint
    val df = (-50 to 50).map(i => (if (i > 0) 1.0 else 0.0, i / 10.0))
      .toDF("y", "x")
    val r = Glm.logitIrls(df, col("y"), col("x"), iters = 3).collect()(0)
    assert(r.getAs[Long]("n") == 101L)
    val b1 = r.getAs[Double]("b1")
    assert(b1 > 0.5, s"expected positive slope, got $b1")
    assert(!b1.isNaN && !b1.isInfinite)
  }

  test("logitIrls: singular Hessian (constant x) yields finite coefficients") {
    import spark.implicits._
    // constant x makes H rank-1 ⇒ det = 0; the guarded update must keep
    // the previous beta instead of emitting NaN/Infinity
    val df = Seq((1.0, 2.0), (0.0, 2.0), (1.0, 2.0), (0.0, 2.0))
      .toDF("y", "x")
    val r = Glm.logitIrls(df, col("y"), col("x"), iters = 3).collect()(0)
    val b0 = r.getAs[Double]("b0")
    val b1 = r.getAs[Double]("b1")
    assert(!b0.isNaN && !b0.isInfinite, s"b0=$b0")
    assert(!b1.isNaN && !b1.isInfinite, s"b1=$b1")
  }
}
