package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the TPC-H-ish test tables (see TESTDATA.md). One parquet
  * file per table; at cluster scale these would be partitioned
  * directories — the reader API is identical.
  *
  * The load path is a PLAIN `spark.read.parquet` by default: no
  * repartition, no conf mutation — filters and projections push into
  * the scan and aggregations keep their partial-before-shuffle shape.
  * The one local-mode accommodation (single-row-group test files scan
  * as one task) is gated behind [[GraftSession.LocalSpreadKey]],
  * default off, and memoized so it costs one spread per table per
  * session instead of one full-table exchange per query.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Primary join/group key per non-tiny table: hash (not round-robin)
    * spread both avoids a sort pass and CO-LOCATES the common joins —
    * lineitem⋈orders on orderkey reuses this partitioning instead of
    * shuffling twice; user_id doubles as the window partition key for
    * events.
    */
  private val spreadKey: Map[String, String] = Map(
    "customer"   -> "c_custkey",
    "part"       -> "p_partkey",
    "orders"     -> "o_orderkey",
    "lineitem"   -> "l_orderkey",
    "events"     -> "user_id",
    "documents"  -> "doc_id",
    "embeddings" -> "vec_id")

  /** Memoized spread tables, keyed per session so a stopped session's
    * DataFrames are never handed to a new one. JVM-lifetime cache: the
    * spread exists only under the local bench flag, where sessions are
    * one-per-JVM (Bench/Verify/test suite).
    */
  private val spread = new ConcurrentHashMap[(Int, String, String), DataFrame]()

  /** Read one table, normalizing every time column to a session-TZ
    * TIMESTAMP whatever the generator emitted:
    *   - `events.ts` as TIMESTAMP(NANOS) parquet reads as raw
    *     nanos-since-epoch under `spark.sql.legacy.parquet.nanosAsLong
    *     =true` (see [[GraftSession.required]]) — converted with
    *     `div 1000` in integer space (a double intermediate loses
    *     precision > 2^53 ns);
    *   - ANY plain timestamp[us] without isAdjustedToUTC reads as
    *     TIMESTAMP_NTZ — cast to TIMESTAMP under the UTC session
    *     timezone, which keeps the wall-clock values byte-identical to
    *     the oracle's naive read of the same file. Normalizing here
    *     (not per-query) matters because function input coercion is
    *     inconsistent: `date_trunc` accepts NTZ, `unix_micros` rejects
    *     it at analysis.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val ntzFixed = raw.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(raw)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType)))
    val df = ntzFixed.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        ntzFixed.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => ntzFixed
    }
    if (!GraftSession.localSpread(spark)) df
    else spread.computeIfAbsent((System.identityHashCode(spark), dir, name), _ =>
      spreadKey.get(name)
        .map(key => df.repartition(spark.sparkContext.defaultParallelism, col(key)))
        .getOrElse(df)
        .persist())
  }
}
