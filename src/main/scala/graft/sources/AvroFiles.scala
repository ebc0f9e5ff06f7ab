package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** AvroIO (reference: SDK/io/AvroIO.java — Avro container files with
  * generic records): a self-contained implementation on the Avro library
  * itself (bundled with every Spark distribution), independent of the
  * optional spark-avro connector module. Read parses each container's
  * embedded writer schema (DataFileStream); write embeds the schema
  * derived from the DataFrame and commits shards via [[ShardedCommit]]
  * (the reference writes Avro through the same FileBasedSink protocol).
  *
  * Schema mapping per SURVEY §1.2 (AvroCoder row): primitives, bytes,
  * string, nested records, arrays, string-keyed maps, nullable =
  * union(null, T), enum → string and fixed → binary on read, and the
  * date / timestamp-micros / timestamp-millis / local-timestamp (NTZ)
  * logical types. Decimals and
  * non-nullable multi-branch unions are out of scope and throw. The read
  * is block-splittable via Avro sync markers (DataFileReader.sync/pastSync,
  * the container format's standard split contract): byte-range splits are
  * distributed and each is stream-decoded on its executor
  * ([[DistributedRead.readRanges]]), so per-task memory is O(one block),
  * file size is unbounded, and a single huge shard fans out across the
  * cluster instead of pinning one task. */
object AvroFiles {

  // ------------------------------------------------- Catalyst -> Avro schema
  def toAvroSchema(dt: DataType, name: String, nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
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
      case ArrayType(elem, containsNull) =>
        Schema.createArray(toAvroSchema(elem, name + "_item", containsNull))
      case MapType(StringType, v, valueContainsNull) =>
        Schema.createMap(toAvroSchema(v, name + "_value", valueContainsNull))
      case st: StructType => structToAvro(st, name)
      case other =>
        throw new UnsupportedOperationException(s"Avro mapping for $other")
    }
    if (nullable && base.getType != Schema.Type.UNION)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  def structToAvro(st: StructType, name: String): Schema = {
    val rec = Schema.createRecord(name, null, "graft.avro", false)
    rec.setFields(st.fields.map { f =>
      // nested record names are PATH-qualified (name_field): Avro names
      // are global per namespace, so two different structs both under a
      // field called e.g. `meta` must not collide ("Can't redefine")
      new Schema.Field(f.name, toAvroSchema(f.dataType, name + "_" + f.name, f.nullable),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }.toList.asJava)
    rec
  }

  // ------------------------------------------------- Avro -> Catalyst schema
  /** Returns (dataType, nullable). */
  def toCatalyst(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
        (TimestampType, false)
      case _: LogicalTypes.LocalTimestampMicros | _: LogicalTypes.LocalTimestampMillis =>
        (TimestampNTZType, false)
      case _ => (LongType, false)
    }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (e, n) = toCatalyst(s.getElementType); (ArrayType(e, n), false)
    case Schema.Type.MAP =>
      val (v, n) = toCatalyst(s.getValueType); (MapType(StringType, v, n), false)
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.toSeq.map { f =>
        val (dt, n) = toCatalyst(f.schema()); StructField(f.name(), dt, n)
      }), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size != 1)
        throw new UnsupportedOperationException(s"multi-branch union $s")
      val (dt, _) = toCatalyst(nonNull.head)
      (dt, branches.size != nonNull.size)
    case other =>
      throw new UnsupportedOperationException(s"Catalyst mapping for Avro $other")
  }

  // ----------------------------------------------------- value conversions
  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toAvroValue(v: Any, dt: DataType, s: Schema): AnyRef =
    if (v == null) null
    else (dt, v) match {
      case (BinaryType, b: Array[Byte]) => ByteBuffer.wrap(b)
      case (DateType, d: java.sql.Date) =>
        Int.box(d.toLocalDate.toEpochDay.toInt)
      case (TimestampType, t: java.sql.Timestamp) =>
        Long.box(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
      case (TimestampNTZType, t: java.time.LocalDateTime) =>
        // local-timestamp-micros: micros since epoch in NO zone
        Long.box(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano / 1000L)
      case (ByteType, b: Byte) => Int.box(b.toInt)
      case (ShortType, x: Short) => Int.box(x.toInt)
      case (ArrayType(e, _), xs: scala.collection.Seq[_]) =>
        val es = nonNullBranch(s).getElementType
        xs.map(x => toAvroValue(x, e, es)).asJava
      case (MapType(StringType, vt, _), m: scala.collection.Map[_, _]) =>
        val vs = nonNullBranch(s).getValueType
        m.map { case (k, x) => k.toString -> toAvroValue(x, vt, vs) }.asJava
      case (st: StructType, r: Row) => rowToRecord(r, st, nonNullBranch(s))
      case _ => v.asInstanceOf[AnyRef]
    }

  def rowToRecord(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvroValue(row.get(i), f.dataType,
        avro.getField(f.name).schema()))
    }
    rec
  }

  private def toCatalystValue(v: Any, dt: DataType, s: Schema): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString // Utf8 / enum symbol
      case BinaryType => v match {
        case bb: ByteBuffer =>
          val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
        case fx: org.apache.avro.generic.GenericFixed => fx.bytes().clone()
        case b: Array[Byte] => b
      }
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Number].longValue()))
      case TimestampType =>
        // the Avro schema carries the unit: timestamp-millis needs x1000
        // (both logical types map to Catalyst TimestampType, micros)
        val n = v.asInstanceOf[Number].longValue()
        val micros =
          if (nonNullBranch(s).getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis])
            Math.multiplyExact(n, 1000L)
          else n
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt); t
      case TimestampNTZType =>
        val n = v.asInstanceOf[Number].longValue()
        val micros =
          if (nonNullBranch(s).getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMillis])
            Math.multiplyExact(n, 1000L)
          else n
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case ArrayType(e, _) =>
        val es = nonNullBranch(s).getElementType
        v.asInstanceOf[java.util.Collection[_]].asScala.toSeq
          .map(toCatalystValue(_, e, es))
      case MapType(StringType, vt, _) =>
        val vs = nonNullBranch(s).getValueType
        v.asInstanceOf[java.util.Map[_, _]].asScala
          .map { case (k, x) => k.toString -> toCatalystValue(x, vt, vs) }.toMap
      case st: StructType =>
        recordToRow(v.asInstanceOf[GenericRecord], st, nonNullBranch(s))
      case _ => v
    }

  def recordToRow(rec: GenericRecord, st: StructType, avro: Schema): Row =
    Row.fromSeq(st.fields.toSeq.map(f =>
      toCatalystValue(rec.get(f.name), f.dataType, avro.getField(f.name).schema())))

  // ------------------------------------------------------------------- read
  /** AvroIO.read(): schema = the first matched file's embedded writer
    * schema (files under one pattern are assumed schema-homogeneous, the
    * reference's contract for a single read — AvroIO.java "all files must
    * have the same schema"). */
  def read(spark: SparkSession, pattern: String,
           splitSizeBytes: Long = 0L): DataFrame = {
    val dataFiles = DistributedRead.expand(spark, pattern)
    require(dataFiles.nonEmpty, s"no Avro files match $pattern")
    val fs = dataFiles.head.getPath
      .getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(dataFiles.head.getPath)
    val writerSchema = try {
      new DataFileStream(in, new GenericDatumReader[GenericRecord]()).getSchema
    } finally in.close()
    val (dt, _) = toCatalyst(writerSchema)
    val structType = dt.asInstanceOf[StructType]
    // sync-marker block splits (the container format's own split contract:
    // a split owns the blocks whose sync point falls in [start, end)), so
    // one huge shard fans out instead of pinning a single task; split size
    // defaults to the session's scan granularity (files.maxPartitionBytes)
    val splitBytes = if (splitSizeBytes > 0) splitSizeBytes
      else spark.sessionState.conf.filesMaxPartitionBytes
    val splits = dataFiles.flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until n).map(i =>
        (st.getPath.toString, i * splitBytes, math.min(len, (i + 1) * splitBytes)))
    }
    DistributedRead.readRanges(spark, splits) { (path, start, end, conf) =>
      val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
        new org.apache.avro.mapred.FsInput(new Path(path), conf),
        new GenericDatumReader[GenericRecord]())
      // decode against the FILE's own embedded schema (logical-type
      // units may differ per file even when the Catalyst shape agrees)
      val fileSchema = reader.getSchema
      reader.sync(start) // first sync point at/after start
      val records = new Iterator[Row] {
        def hasNext: Boolean = reader.hasNext && !reader.pastSync(end)
        def next(): Row = recordToRow(reader.next(), structType, fileSchema)
      }
      (records, reader)
    }(Encoders.row(structType))
      .toDF()
  }

  /** AvroIO.write(): the DataFrame's schema becomes the embedded Avro
    * schema; shards commit via the FileBasedSink protocol. Returns the
    * committed paths. */
  def write(df: DataFrame, dir: String, numShards: Int = 0,
            recordName: String = "topLevelRecord"): Seq[String] = {
    val structType = df.schema
    val avroJson = structToAvro(structType, recordName).toString
    val data = if (numShards > 0) df.repartition(numShards) else df
    ShardedCommit.write(data, dir, ".avro") { (rows, out) =>
      // Schema is parsed per shard from JSON: org.apache.avro.Schema
      // serializability is not part of its contract
      val schema = new Schema.Parser().parse(avroJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      try rows.foreach(r => w.append(rowToRecord(r, structType, schema)))
      finally w.close()
    }
  }
}
