package org.apache.spark.sql.graft

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Parquet reading bridge for graft's DSv2 snapshot streaming source.
  *
  * `FileFormat.buildReaderWithPartitionValues` — the engine's own
  * "give me a serializable PartitionedFile → InternalRow iterator"
  * factory, the exact thing every FileScanRDD task runs — is
  * `private[sql]`, so a custom DSv2 source cannot reach it from an
  * external package. Re-exporting it here (the same minimal-bridge
  * pattern as [[DatasetBridge]]/[[bridge]]) means the snapshot stream
  * reads parquet through the IDENTICAL code path as a batch scan:
  * vectorized reader, schema null-fill for evolved files, predicate
  * machinery — instead of a hand-rolled parquet decoder.
  */
object ParquetReadBridge {

  /** A serializable reader function for `schema` (missing columns in
    * older files come back null — the schema-evolution contract). The
    * function is built ONCE on the driver and shipped inside the
    * reader factory, exactly how FileScanRDD uses it.
    */
  def reader(spark: SparkSession, schema: StructType,
      options: Map[String, String]): PartitionedFile => Iterator[InternalRow] = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // returning_batch=false: keep the vectorized reader but hand back
    // ROWS (ColumnarBatch delivery is a whole-stage-codegen contract
    // between FileSourceScanExec and its parent; a PartitionReader
    // consumes row-at-a-time)
    val opts = options +
      (org.apache.spark.sql.execution.datasources.FileFormat.OPTION_RETURNING_BATCH -> "false")
    new ParquetFileFormat().buildReaderWithPartitionValues(
      cs,
      dataSchema = schema,
      partitionSchema = new StructType(),
      requiredSchema = schema,
      filters = Nil,
      options = opts,
      hadoopConf = cs.sessionState.newHadoopConfWithOptions(opts))
  }

  /** A whole-file PartitionedFile (no partition values, no split). */
  def wholeFile(path: String, bytes: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path),
      0L, bytes, Array.empty, 0L, bytes, Map.empty)
}
