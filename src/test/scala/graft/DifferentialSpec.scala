package graft

import graft.functions.vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded randomized differential tests: the custom TypedImperative
  * top-k aggregate and the native vector expressions must agree with
  * their built-in/HOF reference formulations on arbitrary data —
  * including tie-heavy score distributions and varied k, the cases a
  * hand-written example can silently miss.
  */
class DifferentialSpec extends SparkSpec {

  test("top_k_by ≡ row_number window on random tie-heavy data, across seeds and k") {
    import spark.implicits._
    for (seed <- Seq(1, 42, 2026); k <- Seq(1, 3, 7)) {
      val rnd = new scala.util.Random(seed)
      // scores drawn from 5 discrete values → dense ties exercise the
      // (score desc, id asc) total order
      val rows = (1 to 300).map { i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(5) / 4.0, i.toLong)
      }
      val df = rows.toDF("g", "score", "id")
      val viaAgg = df.groupBy(col("g"))
        .agg(vector.topKBy(col("score"), col("id"), k).as("top"))
        .select(col("g"), explode(col("top")).as("t"))
        .select(col("g"), col("t.id").as("id"), col("t.rank").as("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val w = Window.partitionBy(col("g")).orderBy(desc("score"), col("id"))
      val viaWindow = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col("g"), col("id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(viaAgg == viaWindow, s"seed=$seed k=$k disagreement")
    }
  }

  test("top_k_by partial/merge path: agreement survives many small partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(i => (rnd.nextInt(3).toLong, rnd.nextDouble(), i.toLong))
      .toDF("g", "score", "id")
      .repartition(37) // force many map-side partials per group
    val viaAgg = df.groupBy(col("g"))
      .agg(vector.topKBy(col("score"), col("id"), 5).as("top"))
      .select(explode(col("top")).as("t")).select(col("t.id"))
      .collect().map(_.getLong(0)).toSet
    val w = Window.partitionBy(col("g")).orderBy(desc("score"), col("id"))
    val viaWindow = df.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(viaAgg == viaWindow)
  }

  test("native dot/cosine ≡ HOF reference on random vectors across lengths") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = for (dim <- Seq(1, 3, 16, 64); _ <- 1 to 10) yield (
      Array.fill(dim)(rnd.nextFloat() * 2 - 1),
      Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val df = vecs.toDF("a", "b")
    val diff = df.select(
        vector.dot(col("a"), col("b")).as("dn"),
        vector.dotHof(col("a"), col("b")).as("dh"),
        vector.cosine(col("a"), col("b")).as("cn"),
        vector.cosineHof(col("a"), col("b")).as("ch"))
      .filter(col("dn") =!= col("dh") || col("cn") =!= col("ch"))
    assert(diff.count() == 0)
  }
}
