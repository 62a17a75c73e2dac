package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distributed PCA (top principal component) the RowMatrix way: the
  * d×d Gram matrix of the centered data is a partial-aggregated sum
  * of per-row outer products (cost d² per row, independent of n —
  * the standard tall-skinny regime), and the leading eigenvector
  * comes from power iteration on that O(d²) frame. No row-level
  * shuffle anywhere: the outer-product expansion is map-side, the
  * Gram reduce carries d² partials, and each power step joins the
  * broadcast current vector.
  */
object Pca {

  /** Leading eigenvector of the covariance of `vecCol` (float array,
    * `dim` components), `iters` power iterations from the all-ones
    * vector, ∞-norm normalized. Returns (dim, loading) with loading
    * scaled so max |loading| = 1 (an eigenvector is defined up to
    * scale; ∞-normalization keeps every step exact).
    *
    * Determinism: components quantize ONCE to scale-5 fixed point
    * (floor(double·1e5 + 0.5)); the mean is the ties-toward-+∞
    * integer mean; centered values, Gram entries, and every w = G·u
    * accumulation are exact BIGINTs (per-term quantization at unit
    * 1e3); normalization divides by the exact integer max-abs
    * component and re-quantizes u to the 1e-9 grid — so every
    * iteration starts from bit-identical state on any engine.
    * Bounds: |c| ≤ ~4e5 units ⇒ Gram sums need n·1.6e11 < 2^63
    * (n up to ~5e7 rows; larger corpora scale the quantization down
    * or lift sums to DECIMAL).
    */
  def topComponent(df: DataFrame, idCol: String, vecCol: String,
      iters: Int = 3): DataFrame = {
    val OFF = 1000000000L
    val ints = df.select(col(idCol).cast(LongType).as("vid"),
        transform(col(vecCol),
          x => floor(x.cast(DoubleType) * lit(1.0e5) + lit(0.5))).as("iv"))
      .persist()
    val e = ints.select(col("vid"), posexplode(col("iv")).as(Seq("d0", "x")))
      .select(col("vid"), (col("d0") + 1).cast(LongType).as("dim"), col("x"))
    val mn = e.groupBy(col("dim"))
      .agg((floor((lit(2L) * (sum(col("x")) + lit(OFF) * count(lit(1))) + count(lit(1))) /
        (lit(2.0) * count(lit(1)))) - lit(OFF)).cast(LongType).as("m"))
    // means as an ordered array literal riding a 1-row broadcast, so
    // centering is a map-side zip_with and the outer products expand
    // without any row-level join
    val mrow = mn.agg(transform(sort_array(collect_list(struct(col("dim"), col("m")))),
      s => s.getField("m")).as("marr"))
    val cdf = ints.crossJoin(broadcast(mrow))
      .select(col("vid"), zip_with(col("iv"), col("marr"), (a, b) => a - b).as("cv"))
    val g = cdf
      .select(col("cv"), posexplode(col("cv")).as(Seq("a0", "ca")))
      .select((col("a0") + 1).cast(LongType).as("da"), col("ca"),
        posexplode(col("cv")).as(Seq("b0", "cb")))
      .groupBy(col("da"), (col("b0") + 1).cast(LongType).as("db"))
      .agg(sum(col("ca") * col("cb")).as("gv"))
      .persist() // consumed once per power iteration
    var u = mn.select(col("dim"), lit(OFF).as("uu")) // u0 = all-ones (1.0 in 1e-9 units)
    for (_ <- 1 to iters) {
      val w = g.join(broadcast(u.withColumnRenamed("dim", "db")), "db")
        .groupBy(col("da").as("dim"))
        .agg(sum(floor(col("gv").cast(DoubleType) * (col("uu").cast(DoubleType) / lit(1.0e9)) /
          lit(1.0e3) + lit(0.5))).as("wu"))
      val mx = w.agg(max(abs(col("wu"))).as("mx"))
      u = w.crossJoin(broadcast(mx))
        .select(col("dim"),
          floor(col("wu").cast(DoubleType) / col("mx").cast(DoubleType) * lit(1.0e9) + lit(0.5))
            .as("uu"))
        .localCheckpoint(true) // single consumer per iteration; keeps the plan O(1)-deep
    }
    // the final u is eagerly checkpointed, so both caches can go
    ints.unpersist(false)
    g.unpersist(false)
    u.select(col("dim"), (col("uu").cast(DoubleType) / lit(1.0e9)).as("loading"))
      .orderBy(col("dim"))
  }
}
