package graft

import graft.api.Pipeline
import graft.operators.Clean
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's full ETL transform (extract → validate
    * → standardize → derive) via the Pipeline API on sf0.001 documents.
    * Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.builder(spark)
      .source("documents")(s => Tables(s, "/root/testdata/sf0.001", "documents"))
      .transform(df => Clean.requireFields(df, Seq("text", "lang", "source")))
      .transform(Clean.standardize)
      .transform(df => Clean.withIngestTimestamp(df))
      .transformed()

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (hash-seeded / approximate) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
