package graft.sources

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Minimal Avro container source/sink over avro-core.
  *
  * The `spark-avro` connector is not on this classpath (offline
  * container — only the avro core/ipc/mapred jars ship with Spark), so
  * `spark.read.format("avro")` is unavailable; this implements the
  * container-file format directly against the public avro-core API.
  * Files written here are standard .avro object-container files
  * (readable by any Avro tooling), and reading accepts files produced
  * elsewhere within the supported type subset.
  *
  * Supported Spark types: Boolean, Integer, Long, Float, Double,
  * String, Binary, Date, Timestamp (micros), Decimal (bytes +
  * logical type), Array and nested Struct of the above. Every field
  * is written as the nullable union [null, T]; on read, [null, T]
  * unions map back to nullable fields.
  *
  * Scale shape: one container file per partition on write (streamed
  * through the Hadoop FS — works on HDFS/S3 paths), one read task per
  * file on read (Avro container files are block-splittable, but a
  * per-file task matches how the connector-less format is used here:
  * modest file counts; compact with Writers.compact sizing upstream).
  */
object AvroIO {

  /** Serializable carrier for the driver's Hadoop Configuration so
    * executor-side FS access sees programmatic settings (spark.hadoop.*,
    * s3a credentials, defaultFS) instead of a bare `new Configuration()`.
    */
  private class SerializableConf(@transient var value: Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Spark → Avro schema (all fields nullable unions). */
  def avroSchema(st: StructType, name: String = "spark_record"): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, nullable(avroType(f.dataType, s"${name}_${f.name}")),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  private def avroType(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(el, _) => Schema.createArray(nullable(avroType(el, name)))
    case st: StructType => avroSchema(st, name)
    case other => throw new IllegalArgumentException(
      s"unsupported Spark type for Avro: $other")
  }

  /** Avro → Spark schema (only [null, T] unions supported). */
  def sparkSchema(s: Schema): StructType = StructType(
    s.getFields.asScala.map { f =>
      StructField(f.name(), sparkType(unwrap(f.schema())), nullable = true)
    }.toArray)

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported: $s")
      nonNull.head
    } else s

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros]) TimestampType
      else if (s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros]) TimestampNTZType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.ARRAY => ArrayType(sparkType(unwrap(s.getElementType)), true)
    case Schema.Type.RECORD => sparkSchema(s)
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  // ── value conversion ──────────────────────────────────────────────

  private def toAvro(v: Any, s: Schema): Any = v match {
    case null => null
    case _ => unwrap(s) match {
      case sc if sc.getType == Schema.Type.INT &&
          sc.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
        v match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
          case d: java.time.LocalDate => d.toEpochDay.toInt
        }
      case sc if sc.getType == Schema.Type.LONG &&
          sc.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros] =>
        v match {
          case t: java.sql.Timestamp =>
            t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
          case t: java.time.Instant =>
            t.getEpochSecond * 1000000L + t.getNano / 1000L
        }
      case sc if sc.getType == Schema.Type.LONG &&
          sc.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros] =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case sc if sc.getType == Schema.Type.BYTES =>
        sc.getLogicalType match {
          case _: LogicalTypes.Decimal =>
            java.nio.ByteBuffer.wrap(
              v.asInstanceOf[java.math.BigDecimal].unscaledValue.toByteArray)
          case _ => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
        }
      case sc if sc.getType == Schema.Type.ARRAY =>
        val el = sc.getElementType
        v.asInstanceOf[scala.collection.Seq[Any]].map(toAvro(_, el)).asJava
      case sc if sc.getType == Schema.Type.RECORD =>
        rowToRecord(v.asInstanceOf[Row], sc)
      case sc if sc.getType == Schema.Type.INT =>
        v match {
          case b: Byte => b.toInt
          case sh: Short => sh.toInt
          case i: Int => i
        }
      case _ => v
    }
  }

  private def rowToRecord(row: Row, s: Schema): GenericRecord = {
    val rec = new GenericData.Record(s)
    var i = 0
    val fields = s.getFields
    while (i < fields.size()) {
      rec.put(i, toAvro(row.get(i), fields.get(i).schema()))
      i += 1
    }
    rec
  }

  private def fromAvro(v: Any, s: Schema): Any = v match {
    case null => null
    case _ => unwrap(s) match {
      case sc if sc.getType == Schema.Type.INT &&
          sc.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Number].longValue))
      case sc if sc.getType == Schema.Type.LONG &&
          sc.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros] =>
        val micros = v.asInstanceOf[Long]
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      case sc if sc.getType == Schema.Type.LONG &&
          sc.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros] =>
        val micros = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case sc if sc.getType == Schema.Type.BYTES =>
        val buf = v.asInstanceOf[java.nio.ByteBuffer]
        val bytes = new Array[Byte](buf.remaining()); buf.duplicate().get(bytes)
        sc.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale)
          case _ => bytes
        }
      case sc if sc.getType == Schema.Type.STRING => v.toString
      case sc if sc.getType == Schema.Type.ARRAY =>
        val el = sc.getElementType
        v.asInstanceOf[java.util.Collection[Any]].asScala.map(fromAvro(_, el)).toSeq
      case sc if sc.getType == Schema.Type.RECORD =>
        recordToRow(v.asInstanceOf[GenericRecord], sc)
      case _ => v
    }
  }

  private def recordToRow(rec: GenericRecord, s: Schema): Row = {
    val fields = s.getFields
    val vals = new Array[Any](fields.size())
    var i = 0
    while (i < fields.size()) {
      vals(i) = fromAvro(rec.get(i), fields.get(i).schema())
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  // ── write / read ──────────────────────────────────────────────────

  /** Write `df` as Avro container files under `dir` (overwrite), one
    * `part-NNNNN.avro` per partition plus `_SUCCESS`, deflate-coded
    * (pure JDK — no native codec dependency).
    *
    * Caveat vs the built-in sinks: parts are written directly (no
    * task-commit protocol), so a task RETRY simply overwrites its own
    * deterministic part name, but concurrent duplicate attempts
    * (speculative execution) could interleave — disable
    * `spark.speculation` (the default) when writing through this
    * sink, and treat `_SUCCESS` as the completion marker.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val schemaJson = avroSchema(df.schema).toString
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new Path(dir)
    val fs = target.getFileSystem(hconf)
    fs.delete(target, true)
    fs.mkdirs(target)
    // an empty frame can have ZERO partitions (limit(0)) — write one
    // empty container file anyway so the schema survives the round-trip
    val rdd0 = df.rdd
    val rdd = if (rdd0.getNumPartitions == 0)
      spark.sparkContext.parallelize(Seq.empty[Row], 1) else rdd0
    // ship the driver conf to write tasks: executor-side FS resolution
    // must see spark.hadoop.* / credentials, not a default Configuration
    val bcConf = spark.sparkContext.broadcast(new SerializableConf(hconf))
    rdd.mapPartitionsWithIndex { (idx, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val part = new Path(dir, f"part-$idx%05d.avro")
      val out = part.getFileSystem(bcConf.value.value).create(part, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      writer.create(schema, out)
      var n = 0L
      try rows.foreach { r => writer.append(rowToRecord(r, schema)); n += 1 }
      finally writer.close() // closes the stream
      Iterator.single(n)
    }.count()
    fs.create(new Path(target, "_SUCCESS"), true).close()
  }

  /** Read Avro container files under `dir` (or a single file). The
    * schema comes from the first file; one read task per file.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(hconf)
    val files =
      (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq else Seq(fs.getFileStatus(p)))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
        .map(_.getPath.toString)
        .sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val first = new DataFileReader[GenericRecord](
      new FsInput(new Path(files.head), hconf),
      new GenericDatumReader[GenericRecord]())
    val schemaJson = try first.getSchema.toString finally first.close()
    val sparkSt = sparkSchema(new Schema.Parser().parse(schemaJson))
    val bcConf = spark.sparkContext.broadcast(new SerializableConf(hconf))
    val rows = spark.sparkContext.parallelize(files, files.size).flatMap { f =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new DataFileReader[GenericRecord](
        new FsInput(new Path(f), bcConf.value.value),
        new GenericDatumReader[GenericRecord](schema))
      // a task that stops early (limit/take, downstream exception) never
      // drains the iterator — close via the task-completion hook, not
      // only on exhaustion. DataFileReader.close() is idempotent.
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => reader.close()))
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = reader.hasNext
          if (!h) reader.close()
          h
        }
        override def next(): Row = recordToRow(reader.next(), schema)
      }
    }
    spark.createDataFrame(rows, sparkSt)
  }
}
