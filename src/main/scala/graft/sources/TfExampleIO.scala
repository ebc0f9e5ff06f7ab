package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.coders.TfExample
import graft.coders.TfExample._

/** Schema-driven tf.train.Example ↔ DataFrame mapping over TFRecord files —
  * the standard training-data interchange format (TFRecord of tf.Example),
  * built on the pure-Scala [[graft.coders.ProtoWire]] codec and the existing
  * [[TFRecordIO]] framing (masked-crc32c, gzip AUTO, temp+rename commit).
  *
  * Column-type mapping (the tf.Example triad — there is no double/bool on
  * the wire, so doubles narrow to float32 and that narrowing is this API's
  * documented contract, same as TensorFlow's own parse_example):
  *
  *  - STRING → bytes_list (UTF-8), BINARY → bytes_list
  *  - LONG / INT → int64_list
  *  - FLOAT / DOUBLE → float_list (float32 on the wire)
  *  - ARRAY of the above → the whole list in one feature
  *
  * NULL values omit the feature; a missing/empty feature decodes as NULL
  * (scalar ask) or NULL array (array ask). A kind mismatch (e.g. asking
  * LONG where the wire has a float_list) fails loud with the feature name.
  *
  * Scale: encode and decode are row-local (mapPartitions, zero shuffle,
  * memory bounded by one record) — the plan is a straight narrow pipeline
  * that scales embarrassingly to any corpus size.
  */
object TfExampleIO {

  private def toFeature(dt: DataType, v: Any): TfFeature = (dt, v) match {
    case (StringType, s: String) => BytesListF(Vector(s.getBytes("UTF-8")))
    case (BinaryType, b: Array[Byte]) => BytesListF(Vector(b))
    case (LongType, l: java.lang.Long) => Int64ListF(Vector(l))
    case (IntegerType, i: java.lang.Integer) => Int64ListF(Vector(i.toLong))
    case (FloatType, f: java.lang.Float) => FloatListF(Vector(f))
    case (DoubleType, d: java.lang.Double) => FloatListF(Vector(d.toFloat))
    case (ArrayType(et, _), seq: scala.collection.Seq[_]) =>
      et match {
        case StringType => BytesListF(seq.map(_.asInstanceOf[String].getBytes("UTF-8")).toVector)
        case BinaryType => BytesListF(seq.map(_.asInstanceOf[Array[Byte]]).toVector)
        case LongType => Int64ListF(seq.map(_.asInstanceOf[java.lang.Long].longValue).toVector)
        case IntegerType => Int64ListF(seq.map(_.asInstanceOf[java.lang.Integer].toLong).toVector)
        case FloatType => FloatListF(seq.map(_.asInstanceOf[java.lang.Float].floatValue).toVector)
        case DoubleType => FloatListF(seq.map(_.asInstanceOf[java.lang.Double].toFloat).toVector)
        case other => throw new IllegalArgumentException(
          s"tf.Example cannot carry array<$other>")
      }
    case (other, _) => throw new IllegalArgumentException(
      s"tf.Example cannot carry $other (supported: string/binary/long/int/" +
        "float/double and arrays thereof)")
  }

  /** One row → canonical Example bytes (features sorted by name). */
  def encodeRow(schema: StructType, row: Row): Array[Byte] = {
    val feats = schema.fields.iterator.zipWithIndex.collect {
      case (f, i) if !row.isNullAt(i) => f.name -> toFeature(f.dataType, row.get(i))
    }.toSeq
    TfExample.encode(feats)
  }

  private def fromFeature(name: String, dt: DataType, f: TfFeature): Any = {
    def bad(want: String) = throw new IllegalArgumentException(
      s"feature `$name`: asked for $want but wire holds ${f.getClass.getSimpleName}")
    def scalarOrNull[A](vs: Vector[A], conv: A => Any): Any =
      if (vs.isEmpty) null else conv(vs.head)
    (dt, f) match {
      case (StringType, BytesListF(vs)) => scalarOrNull[Array[Byte]](vs, b => new String(b, "UTF-8"))
      case (BinaryType, BytesListF(vs)) => scalarOrNull[Array[Byte]](vs, identity)
      case (LongType, Int64ListF(vs)) => scalarOrNull[Long](vs, identity)
      case (IntegerType, Int64ListF(vs)) => scalarOrNull[Long](vs, (l: Long) => l.toInt)
      case (FloatType, FloatListF(vs)) => scalarOrNull[Float](vs, identity)
      case (DoubleType, FloatListF(vs)) => scalarOrNull[Float](vs, (x: Float) => x.toDouble)
      case (ArrayType(et, _), _) => (et, f) match {
        case (StringType, BytesListF(vs)) => vs.map(new String(_, "UTF-8"))
        case (BinaryType, BytesListF(vs)) => vs
        case (LongType, Int64ListF(vs)) => vs
        case (IntegerType, Int64ListF(vs)) => vs.map(_.toInt)
        case (FloatType, FloatListF(vs)) => vs
        case (DoubleType, FloatListF(vs)) => vs.map(_.toDouble)
        // unset-kind feature (decodes as empty BytesListF) → NULL array
        case (_, BytesListF(vs)) if vs.isEmpty => null
        case _ => bad(s"array<$et>")
      }
      // empty-kind feature (unset oneof) is NULL for any ask
      case (_, BytesListF(vs)) if vs.isEmpty => null
      case _ => bad(dt.simpleString)
    }
  }

  /** Example bytes → one row of `schema`; missing features → NULL. */
  def decodeToRow(schema: StructType, bytes: Array[Byte]): Row = {
    val fm = TfExample.decode(bytes)
    Row.fromSeq(schema.fields.toSeq.map { f =>
      fm.get(f.name) match {
        case Some(feat) => fromFeature(f.name, f.dataType, feat)
        case None => null
      }
    })
  }

  /** DataFrame → Dataset of Example bytes (row-local, zero shuffle). */
  def encodeRows(df: DataFrame): Dataset[Array[Byte]] = {
    val schema = df.schema
    df.mapPartitions(_.map(encodeRow(schema, _)))(Encoders.BINARY)
  }

  /** Example-bytes column → DataFrame of `schema` (row-local). */
  def decodeBytes(bytes: Dataset[Array[Byte]], schema: StructType): DataFrame = {
    val enc = RowEncoder.encoderFor(schema)
    bytes.mapPartitions(_.map(decodeToRow(schema, _)))(enc)
  }

  /** Write df as TFRecord-of-Example shards; returns committed paths. */
  def write(df: DataFrame, dir: String, numShards: Int = 0,
            suffix: String = ".tfrecord"): Seq[String] =
    TFRecordIO.write(encodeRows(df).toDF("record"), col("record"), dir,
      numShards, suffix)

  /** Read TFRecord-of-Example files into `schema` columns. */
  def read(spark: SparkSession, pattern: String, schema: StructType,
           verifyCrc: Boolean = true): DataFrame = {
    val records = TFRecordIO.read(spark, pattern, verifyCrc)
    decodeBytes(records.select(col("record").as[Array[Byte]](Encoders.BINARY)), schema)
  }
}
