package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage-attribution probe for Dedup.prefixJaccardPairs (the
  * curate_e2e 4_neardup stage's 5s single job):
  * `runMain graft.PrefixJoinProbe <sfDir>`. Diagnostics only.
  */
object PrefixJoinProbe {
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
      .withColumn("blk", concat_ws("|", col("lang"), col("source")))
    val (tauNum, tauDen) = (4L, 5L)
    val toks = docs.select(col("doc_id").as("id"), col("blk"),
      array_distinct(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) >= 2)).as("ws"))
    time("1 toks")(sink(toks))
    val tokDf = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val sorted = toks.select(col("id"), col("blk"), explode(col("ws")).as("w"))
      .join(tokDf, "w")
      .groupBy(col("id"), col("blk"))
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("arr"))
      .select(col("id"), col("blk"), expr("transform(arr, x -> x.w)").as("toks"),
        size(col("arr")).cast(LongType).as("n"))
      .localCheckpoint(true)
    time("2 sorted (rare-first canonical)")(sink(sorted))
    val pref = sorted
      .withColumn("p", expr(
        s"cast(n - ($tauNum * n + ${tauDen - 1}) div $tauDen + 1 as int)"))
      .select(col("id"), col("blk"), col("n"),
        explode(slice(col("toks"), lit(1), col("p"))).as("w"))
    time("3 prefix index")(sink(pref))
    println(s"[probe] prefix rows: ${pref.count()}")
    val cand = pref.as("x").join(pref.as("y"),
        col("x.w") === col("y.w") && col("x.blk") === col("y.blk") &&
          col("x.id") < col("y.id") &&
          lit(tauDen) * col("y.n") >= lit(tauNum) * col("x.n") &&
          lit(tauDen) * col("x.n") >= lit(tauNum) * col("y.n"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    time("4 candidates")(sink(cand))
    println(s"[probe] candidate pairs: ${cand.count()}")
    val ver = cand
      .join(sorted.select(col("id").as("a"), col("toks").as("ta"), col("n").as("na")), "a")
      .join(sorted.select(col("id").as("b"), col("toks").as("tb"), col("n").as("nb")), "b")
      .withColumn("c", size(array_intersect(col("ta"), col("tb"))).cast(LongType))
      .filter(lit(tauDen) * col("c") >= lit(tauNum) * (col("na") + col("nb") - col("c")))
    time("5 verify")(sink(ver))
    spark.stop()
  }
}
