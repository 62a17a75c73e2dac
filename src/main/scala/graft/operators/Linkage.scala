package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter family): score
  * candidate pairs by per-field agreement weights and band the scores
  * into match / possible / non-match — the entity-resolution step
  * upstream of the golden-record merge (q116_survivorship consumes
  * clusters; this operator FINDS them when there is no shared key).
  *
  * Scale shape: candidate pairs come only from equi-blocking (a hash
  * shuffle on the block key — never a cross join); within-block
  * expansion is bounded by the block-size guard. Field comparisons are
  * map-side null-safe equality; integer weights keep scores exact.
  * At 100 TB the block key must be selective (sorted-neighborhood or
  * multi-pass blocking composes by unioning pair sets before the
  * distinct).
  */
object Linkage {

  /** Score all within-block pairs (idA < idB). `fields` maps a column
    * to its (agreementWeight, disagreementWeight); null field values
    * never count as agreement (both-null compares disagree — the
    * conservative Fellegi–Sunter convention for missing data).
    *
    * `maxBlock` drops blocks larger than the bound (and such blocks
    * mean the blocking key is under-selective — the guard turns a
    * quadratic blow-up into a loud, bounded omission).
    *
    * Returns (id_a, id_b, score) plus one `agr_<field>` flag column
    * per compared field.
    */
  def scoreBlockedPairs(df: DataFrame, id: String, blockCols: Seq[String],
      fields: Seq[(String, Int, Int)], maxBlock: Int = 10000): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(fields.nonEmpty, "need at least one compared field")
    val blk = blockCols.map(col)
    // block-size guard via partial agg + semi join — a count window
    // over the block key would funnel exactly the oversized block this
    // guard exists to drop into one task
    val okBlocks = df.groupBy(blk: _*).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBlock)
      .select(blk: _*)
    val sized = df.join(okBlocks, blockCols, "left_semi")
    val fcols = fields.map(_._1)
    val a = sized.select(
      (blk :+ col(id).as("id_a")) ++ fcols.map(c => col(c).as(s"a_$c")): _*)
    val b = sized.select(
      (blk :+ col(id).as("id_b")) ++ fcols.map(c => col(c).as(s"b_$c")): _*)
    val paired = a.join(b, blockCols).filter(col("id_a") < col("id_b"))
    val withFlags = fields.foldLeft(paired) { case (d, (c, _, _)) =>
      d.withColumn(s"agr_$c",
        col(s"a_$c").isNotNull && col(s"b_$c").isNotNull &&
          (col(s"a_$c") === col(s"b_$c")))
    }
    val score = fields.map { case (c, wa, wd) =>
      when(col(s"agr_$c"), lit(wa.toLong)).otherwise(lit(wd.toLong))
    }.reduce(_ + _)
    withFlags.withColumn("score", score)
      .select(Seq(col("id_a"), col("id_b"), col("score")) ++
        fields.map { case (c, _, _) => col(s"agr_$c") }: _*)
  }
}
