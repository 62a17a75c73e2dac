package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the TPC-H-ish test tables (see TESTDATA.md). One parquet
  * file per table; at cluster scale these would be partitioned
  * directories — the reader API is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The test files are written as ONE parquet row group each, so a
    * scan is a single task no matter how maxPartitionBytes is set —
    * every downstream per-row operator would serialize on one core.
    * On a real cluster the input is thousands of splittable files and
    * this is a no-op concern; locally we restore parallelism by hash
    * re-partitioning each non-tiny table on its primary join/group
    * key. Hash (not round-robin) partitioning both avoids the
    * sort-before-repartition pass and CO-LOCATES the common joins:
    * lineitem⋈orders on orderkey reuses this partitioning instead of
    * shuffling twice.
    */
  private val spreadKey: Map[String, String] = Map(
    "customer"   -> "c_custkey",
    "part"       -> "p_partkey",
    "orders"     -> "o_orderkey",
    "lineitem"   -> "l_orderkey",
    "events"     -> "user_id",
    "documents"  -> "doc_id",
    "embeddings" -> "vec_id")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects outright; `nanosAsLong` reads it as raw
    * nanos-since-epoch, converted here to a proper micros timestamp
    * (`div 1000` in integer space — a double intermediate would lose
    * precision above 2^53 ns).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df = raw.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => raw
    }
    spreadKey.get(name) match {
      case Some(key) => df.repartition(spark.sparkContext.defaultParallelism, col(key))
      case None      => df
    }
  }
}
