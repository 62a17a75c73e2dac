package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** I/O connectors — the Extract and Load halves of the reference ETL
  * (reference: server.js:33-62 extract, 100-137 load). The reference
  * pulls JSON from HTTP and writes JSON + CSV on one node; here every
  * source/sink is a distributed Spark reader/writer, schema-enforced,
  * with partitioned writes for the 100 TB path.
  */
object Readers {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Parquet read across files whose schemas evolved (columns added
    * over time): `mergeSchema` unions the per-file schemas; rows from
    * older files surface the newer columns as null. The standard
    * read-side answer to append-only datasets that grew columns.
    */
  def parquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** JSON-lines (the scalable JSON layout); `multiLine=true` reads the
    * reference's pretty-printed array-of-objects files.
    */
  def json(spark: SparkSession, path: String, schema: Option[StructType] = None,
      multiLine: Boolean = false): DataFrame = {
    val r = spark.read.option("multiLine", multiLine.toString)
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
      header: Boolean = true, delimiter: String = ","): DataFrame = {
    val r = spark.read.option("header", header.toString).option("delimiter", delimiter)
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  /** Schema-enforced CSV that QUARANTINES malformed rows instead of
    * failing the job or silently nulling fields: PERMISSIVE mode with
    * a `_corrupt_record` column capturing the raw bad line — the
    * skip-and-report posture of the reference's extract
    * (server.js:39-59) applied to file ingestion. Returns the full
    * frame; callers split on `_corrupt_record IS NULL` into clean rows
    * and a reject report (same shape as Clean.qualityReport). The
    * result is cache()d: Spark disallows queries that prune down to
    * ONLY the corrupt-record column of a raw file
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — caching the parsed frame is
    * the documented pattern, and the clean/reject split reads it twice
    * anyway.
    */
  def csvWithQuarantine(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .cache()
  }

  /** ORC — the other columnar at-scale format (predicate pushdown and
    * column pruning work the same as parquet).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw text: one row per line, single `value` column — the entry
    * point for ingesting unstructured corpora before parsing.
    */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Avro container files — via the avro-core-backed [[AvroIO]] (the
    * spark-avro connector is not on this classpath; see AvroIO docs
    * for the supported type subset).
    */
  def avro(spark: SparkSession, path: String): DataFrame =
    AvroIO.read(spark, path)

  /** XML — Spark 4's built-in XML datasource (one row per `rowTag`
    * element; attributes surface as `_attr` columns). The ingestion
    * path for feed/export dumps that still arrive as XML.
    */
  def xml(spark: SparkSession, path: String, rowTag: String = "row",
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("rowTag", rowTag)
    schema.fold(r)(s => r.schema(s)).xml(path)
  }
}

object Writers {

  /** Partitioned parquet — the canonical at-scale sink. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** CSV download sink (reference: server.js:108-130) — header row,
    * nulls as `nullAs` (the reference coalesces null → '').
    */
  def csv(df: DataFrame, path: String, nullAs: String = "",
      header: Boolean = true, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("header", header.toString)
      .option("nullValue", nullAs)
      .option("emptyValue", nullAs)
      .csv(path)

  /** JSON-lines sink (reference: server.js:106 writes one pretty JSON
    * array; distributed JSONL is the scalable equivalent).
    */
  def json(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC sink (partitioned like the parquet writer). */
  def orc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Avro sink (container files, one per partition — see [[AvroIO]]). */
  def avro(df: DataFrame, path: String): Unit = AvroIO.write(df, path)

  /** XML sink (built-in datasource; one `rowTag` element per row). */
  def xml(df: DataFrame, path: String, rowTag: String = "row",
      rootTag: String = "rows", mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("rowTag", rowTag).option("rootTag", rootTag).xml(path)

  /** Write `df` as exactly ONE file at `file` (not a directory): the
    * reference's download endpoints serve a single artifact
    * (server.js:106 one JSON file, 129-130 one CSV file). coalesce(1)
    * — strictly for small serving results; the distributed writers
    * above are the at-scale sinks. Writes to a hidden sibling temp
    * directory, promotes the lone part file to `file`, and cleans up;
    * all through the Hadoop FileSystem API so it works on HDFS/S3 as
    * well as local disk. Returns the target path.
    */
  private def singleFile(df: DataFrame, file: String)(
      write: (DataFrame, String) => Unit): String = {
    import org.apache.hadoop.fs.Path
    val target = new Path(file)
    val fs = target.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val tmp = new Path(target.getParent, s".${target.getName}.staging")
    fs.delete(tmp, true)
    write(df.coalesce(1), tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file written under $tmp"))
    fs.delete(target, false)
    if (!fs.rename(part, target))
      throw new IllegalStateException(s"could not promote $part to $target")
    fs.delete(tmp, true)
    file
  }

  /** Single CSV download artifact (header, null→`nullAs`). */
  def csvSingleFile(df: DataFrame, file: String, nullAs: String = "",
      header: Boolean = true): String =
    singleFile(df, file)((d, p) =>
      d.write.mode(SaveMode.Overwrite)
        .option("header", header.toString)
        .option("nullValue", nullAs)
        .option("emptyValue", nullAs)
        .csv(p))

  /** Single JSON-lines download artifact. */
  def jsonSingleFile(df: DataFrame, file: String): String =
    singleFile(df, file)((d, p) => d.write.mode(SaveMode.Overwrite).json(p))

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files. Streaming/incremental sinks accrete
    * thousands of kilobyte files; at 100 TB, scan cost is dominated
    * by per-file open/footer overhead and driver listing, so periodic
    * compaction is table maintenance, not optimization. File count =
    * ceil(current bytes / target) from the Hadoop listing (no data
    * pass); the rewrite is one read→repartition→write into a staging
    * dir, atomically swapped in via two renames (old dir kept at
    * `.<name>.pre-compact` until the swap succeeds, then deleted).
    * Returns the resulting file count.
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    import org.apache.hadoop.fs.Path
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataBytes = fs.listStatus(target).filter(_.isFile)
      .filter(f => f.getPath.getName.startsWith("part-")).map(_.getLen).sum
    val n = math.max(1, math.ceil(dataBytes.toDouble / targetBytes).toInt)
    val staging = new Path(target.getParent, s".${target.getName}.compacting")
    val backup = new Path(target.getParent, s".${target.getName}.pre-compact")
    fs.delete(staging, true); fs.delete(backup, true)
    spark.read.parquet(dir).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (!fs.rename(target, backup))
      throw new IllegalStateException(s"could not stage $target aside")
    if (!fs.rename(staging, target)) {
      fs.rename(backup, target) // roll back
      throw new IllegalStateException(s"could not promote $staging to $target")
    }
    fs.delete(backup, true)
    n
  }

  /** Bucketed + sorted managed table: the at-rest layout for repeated
    * fact⋈fact joins — two tables bucketed on the same key with the
    * same bucket count join with NO shuffle (and no sort when sorted),
    * which at 100 TB is the difference between a full-network
    * repartition per query and a local merge per bucket.
    */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Schema-drift report between two frames (e.g. yesterday's and
    * today's load of the same feed): one row per changed column —
    * `added`, `removed`, or `type_changed:<old>-><new>` — empty when
    * the schemas agree. The contract check a multi-source ingest runs
    * before a blind unionByName silently null-fills a renamed column.
    * Pure driver-side metadata (schemas, never data), so it is free
    * at any scale.
    */
  def schemaDiff(spark: SparkSession, before: DataFrame,
      after: DataFrame): DataFrame = {
    import spark.implicits._
    val b = before.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val a = after.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      a.keySet.diff(b.keySet).toSeq.sorted.map(n => (n, "added", a(n))) ++
      b.keySet.diff(a.keySet).toSeq.sorted.map(n => (n, "removed", b(n))) ++
      a.keySet.intersect(b.keySet).toSeq.sorted.collect {
        case n if a(n) != b(n) => (n, s"type_changed:${b(n)}->${a(n)}", a(n))
      }
    rows.toDF("column", "change", "data_type")
  }
}
