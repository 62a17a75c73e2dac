package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graft.ParquetReadBridge
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Structured Streaming SOURCE over a [[Snapshot]] table — the read
  * side of the table-layer streaming story ([[graft.streaming.Refresh
  * .snapshotAppend]]/`snapshotCdcApply` are the write side). A
  * downstream pipeline tails the table exactly-once:
  *
  * {{{
  *   spark.readStream.format("graft-snapshot").load(tableDir)
  * }}}
  *
  * ==Semantics==
  *
  * Offsets ARE manifest versions. Each micro-batch reads exactly the
  * data files ADDED between two committed versions, resolved from the
  * manifests (one set difference of file lists — metadata only, no
  * directory listing, no "new files since" mtime heuristics). Because
  * versions and their file sets are immutable, replaying any offset
  * range after a crash yields byte-identical batches — exactly-once
  * end to end when paired with an idempotent sink, with NO extra
  * bookkeeping beyond the table's own manifests.
  *
  * The source requires an APPEND-ONLY version history past its start
  * offset (`init`/`append` ops — what [[graft.streaming.Refresh
  * .snapshotAppend]] produces). An `upsert`/`replace`/`compact`/
  * `optimize`/`delete`/`restore` version REWRITES or REMOVES rows,
  * which an append row-stream cannot represent (Delta's streaming
  * source has the same restriction
  * without `skipChangeCommits`); hitting one fails loudly rather than
  * silently re-emitting rewritten rows. `option("startingVersion",
  * "latest")` starts past history (new rows only);
  * `option("skipRewrites", "true")` opts into skipping non-append
  * versions (their ADDED files are not emitted — the documented
  * at-most-once-per-rewrite tradeoff, for tables that interleave
  * appends with maintenance [[Snapshot.optimize]] runs, whose
  * rewrites carry no NEW rows).
  *
  * Rows are read through the engine's own parquet reader factory
  * ([[ParquetReadBridge]]) — vectorized, null-filling evolved
  * schemas — with the schema pinned at stream start.
  *
  * Retention interplay: [[Snapshot.vacuum]] must keep at least the
  * versions the slowest consumer hasn't committed yet, or its restart
  * fails loudly on the missing manifest (same contract as any pinned
  * reader).
  */
final class SnapshotStreamProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = SnapshotStreamProvider.tableDir(options)
    val spark = SparkSession.active
    val v = Snapshot.latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"graft-snapshot stream: no committed version at $dir"))
    Snapshot.readManifest(spark, dir, v).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SnapshotStreamTable(schema,
      SnapshotStreamProvider.tableDir(new CaseInsensitiveStringMap(properties)))
}

private object SnapshotStreamProvider {
  def tableDir(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-snapshot stream needs the table dir: readStream.format(\"graft-snapshot\").load(dir)")
    p
  }
}

private final class SnapshotStreamTable(tableSchema: StructType, dir: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-snapshot `$dir`"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val startLatest = "latest".equalsIgnoreCase(options.getOrDefault("startingVersion", ""))
    val skipRewrites = options.getBoolean("skipRewrites", false)
    val maxVersions = options.getLong("maxVersionsPerBatch", Long.MaxValue)
    require(maxVersions >= 1, s"maxVersionsPerBatch must be >= 1: $maxVersions")
    // column pruning: the stream reads ONLY the projected columns off
    // disk — on a wide 100 TB table the difference between tailing a
    // few key columns and decoding every page of every row group
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SnapshotMicroBatchStream(dir, required, startLatest, skipRewrites, maxVersions)
      }
    }
  }
}

/** Version offset: the stream has consumed every version ≤ v. */
private final case class SnapshotOffset(v: Long) extends Offset {
  override def json(): String = s"""{"version":$v}"""
}

private final class SnapshotMicroBatchStream(dir: String, schema: StructType,
    startLatest: Boolean, skipRewrites: Boolean, maxVersions: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def spark = SparkSession.active

  override def initialOffset(): Offset =
    SnapshotOffset(
      if (startLatest) Snapshot.latestVersion(spark, dir).getOrElse(0L) else 0L)

  override def latestOffset(): Offset =
    SnapshotOffset(Snapshot.latestVersion(spark, dir).getOrElse(0L))

  // admission control: a restart against a long-ingested table (or a
  // from-genesis backfill) advances at most `maxVersionsPerBatch`
  // versions per micro-batch instead of swallowing the whole history
  // as one giant batch — bounded batch size, checkpointed progress
  // after each slice
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val latest = Snapshot.latestVersion(spark, dir).getOrElse(0L)
    val from = start.asInstanceOf[SnapshotOffset].v
    // saturating: from + Long.MaxValue must not wrap
    SnapshotOffset(if (latest - from <= maxVersions) latest else from + maxVersions)
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    SnapshotOffset(""""version"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad snapshot offset: $json")))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[SnapshotOffset].v
    val to = end.asInstanceOf[SnapshotOffset].v
    val s = spark
    val parts = Seq.newBuilder[InputPartition]
    var prevPaths: Option[Set[String]] = None // lazily seeded below
    ((from + 1) to to).foreach { v =>
      val m = Snapshot.readManifest(s, dir, v)
      val prev = prevPaths.getOrElse(
        if (v == 1) Set.empty[String]
        else Snapshot.readManifest(s, dir, v - 1).files.map(_.path).toSet)
      val added = m.files.filterNot(e => prev.contains(e.path))
      m.op match {
        case "init" | "append" =>
          added.foreach(e =>
            parts += SnapshotInputPartition(Snapshot.absPath(dir, e.path), e.bytes))
        case "alter" => // metadata-only (constraints); no rows moved — pass through
          ()
        case other if skipRewrites => // documented opt-in: rewrite versions carry no NEW rows
          ()
        case other =>
          throw new IllegalStateException(
            s"graft-snapshot stream at $dir: version $v is op '$other' — a rewrite a " +
              "row-stream cannot represent. Keep streamed tables append-only " +
              "(Refresh.snapshotAppend), start past history with " +
              "option(\"startingVersion\", \"latest\"), or opt into " +
              "option(\"skipRewrites\", \"true\") if maintenance versions carry no new rows.")
      }
      prevPaths = Some(m.files.map(_.path).toSet)
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotReaderFactory(ParquetReadBridge.reader(spark, schema, Map.empty))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private final case class SnapshotInputPartition(absPath: String, bytes: Long)
    extends InputPartition

private final class SnapshotReaderFactory(
    readFile: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SnapshotInputPartition]
    new PartitionReader[InternalRow] {
      // the engine's reader may hand back ColumnarBatch-as-InternalRow
      // (the FileScanRDD contract); flatten both shapes
      private val rows: Iterator[InternalRow] =
        readFile(ParquetReadBridge.wholeFile(p.absPath, p.bytes)).flatMap {
          case b: ColumnarBatch => b.rowIterator().asScala
          case r => Iterator.single(r)
        }
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (rows.hasNext) { current = rows.next(); true } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
