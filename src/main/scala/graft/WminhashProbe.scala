package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution probe for the weighted-MinHash pipeline
  * (`runMain graft.WminhashProbe <sfDir>`): times each sub-pipeline of
  * Dedup.wminhashVerifiedPairs in isolation through the noop sink so
  * the 20s single-job cost seen in the bench decomposition can be
  * pinned to tokenize / replica-expand+sign / candidate-gen / verify.
  * Diagnostics only — never part of the bench or verify surfaces.
  */
object WminhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", "512")
      .config(GraftSession.LocalSpreadKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables(spark, sfDir, "documents")
    import graft.operators.{Dedup, TextAnalysis}
    // 1. token frame (tokenize + per-doc token counts, capped)
    val tf = docs.select(col("doc_id").as("id"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(least(count(lit(1)), lit(16L)).as("w"))
    time("1 tokenframe")(sink(tf))
    val tfp = tf.persist()
    time("1b tf persist-materialize")(sink(tfp))
    // 2. replica expansion only
    val grams = tfp.withColumn("r", explode(sequence(lit(1L), col("w"))))
      .select(col("id"), concat_ws("#", col("token"), col("r")).as("gram"))
    time("2 replica grams")(sink(grams))
    println(s"[probe] gram rows: ${grams.count()}")
    // 3. signatures (63-permutation min agg)
    val sigs = Dedup.weightedMinhashSignatures(docs, "doc_id", "text", 63, 16)
    time("3 signatures (from scratch)")(sink(sigs))
    // 4. candidates
    val cand = Dedup.wminhashCandidates(docs, "doc_id", "text", 63, 21, 16)
    time("4 candidates (from scratch)")(sink(cand))
    println(s"[probe] candidate pairs: ${cand.count()}")
    // 5. full verified pipeline
    time("5 full wminhashVerifiedPairs")(
      sink(Dedup.wminhashVerifiedPairs(docs, "doc_id", "text", 0.5, 63, 21, 16)))
    tfp.unpersist()
    spark.stop()
  }
}
