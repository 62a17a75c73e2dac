package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Curation, Dedup, TextAnalysis}

/** Per-stage timing probe for the curate_e2e composition
  * (`runMain graft.CurateProbe <sfDir>`). Diagnostics only.
  */
object CurateProbe {
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
    val raw = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"), col("n_chars"))
    raw.count() // spread warm-up outside the timers
    val clean = raw.filter(col("text").isNotNull && trim(col("text")) =!= "" &&
      col("source").isNotNull && col("lang").isNotNull)
    val filtered = time("2_filter ckpt") {
      clean
        .withColumn("quality", TextAnalysis.qualityScoreOf(
          TextAnalysis.tokens(col("text")), col("text"), col("n_chars")))
        .join(TextAnalysis.repetitionStats(clean, "doc_id", "text")
          .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
            col("top_bigram_frac")), Seq("doc_id"))
        .filter(col("quality") >= 0.5 && col("n_tokens") >= 20 &&
          col("dup_token_frac") <= 0.5 && col("top_bigram_frac") <= 0.2)
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          col("n_chars"), col("n_tokens"))
        .localCheckpoint(true)
    }
    val exact = time("3_exact ckpt") {
      filtered.join(
        Dedup.exact(filtered, "doc_id", "text")
          .select(col("survivor_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
    }
    val nearKept = time("4_neardup ckpt") {
      exact.join(
        Dedup.prefixJaccardPairs(
          exact.withColumn("blk", concat_ws("|", col("lang"), col("source"))),
          "doc_id", "text", "blk")
          .select(col("b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
    }
    val decon = time("5_decontam ckpt") {
      Curation.decontaminate(
        nearKept.filter(col("doc_id") % 97 =!= 0),
        raw.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 4)
        .localCheckpoint(true)
    }
    val sampled = time("6_mixture ckpt") {
      decon.filter(length(col("source")) === 4 ||
        substring(md5(concat(col("doc_id").cast(StringType), lit(":e2e-v1"))
          .cast(BinaryType)), 1, 8) < "80000000")
        .localCheckpoint(true)
    }
    val packed = Curation.packChunks(
      Curation.chunkDocs(sampled, "doc_id", "text", chunkTokens = 64, overlap = 16)
        .select((col("doc_id") * 4099 + col("chunk_idx")).as("item_id"),
          col("n_chunk_tokens")),
      "item_id", "n_chunk_tokens", budget = 2048L, shards = 8)
    time("7_pack agg")(packed.groupBy(col("shard"))
      .agg((max(col("chunk")) + 1).cast(LongType).as("n"),
        max(col("end_off")).cast(LongType).as("tokens"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
