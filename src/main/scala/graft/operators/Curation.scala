package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data assembly: mixture
  * sampling and train/val/test splitting.
  *
  * Both are DETERMINISTIC hash gates on a stable id — not `rand()`:
  * reproducible across runs, retries, partitionings and cluster
  * sizes, joinable back to the source (the same id always lands in
  * the same split), and pure map-side (no shuffle, no state) at any
  * scale. `rand()`-based sampling breaks all four.
  */
object Curation {

  /** Uniform [0,1) hash gate from a stable id column + salt. */
  def hashGate(id: Column, salt: String): Column =
    (pmod(xxhash64(id, lit(salt)), lit(1000000L)).cast("double") / 1000000.0)

  /** Per-source mixture sampling: keep each row with its source's
    * rate (missing sources → dropped). E.g. down-weight a crawl dump
    * to 10% while keeping curated sources whole.
    */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
      rates: Map[String, Double], salt: String = "mix-v1"): DataFrame = {
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.filter(hashGate(col(idCol), salt) < rate)
  }

  /** Disjoint deterministic split: adds `split` ∈ {train, val, test}
    * with the given proportions (must sum to ≤ 1; remainder → train).
    */
  def split(df: DataFrame, idCol: String, valFrac: Double, testFrac: Double,
      salt: String = "split-v1"): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1.0)
    val g = hashGate(col(idCol), salt)
    df.withColumn("split",
      when(g < testFrac, "test")
        .when(g < testFrac + valFrac, "val")
        .otherwise("train"))
  }
}
