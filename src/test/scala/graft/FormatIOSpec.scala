package graft

import java.io.ByteArrayInputStream
import java.nio.file.Files
import java.util.zip.{CRC32C, GZIPOutputStream}

import org.apache.spark.sql.functions._
import graft.sources.{AvroFiles, TFRecordIO, XmlIO}

/** TFRecord framing + commit-protocol tests (reference: TFRecordIOTest
  * shapes) and XmlIO round-trips over Spark 4's built-in XML source. */
class FormatIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-fmt").toString

  test("CRC32C matches the public check vector") {
    // the classical CRC-32C check value: crc32c("123456789") = 0xE3069283
    val c = new CRC32C(); c.update("123456789".getBytes("US-ASCII"))
    assert(c.getValue == 0xE3069283L)
  }

  test("tfrecord framing layout: LE length, masked crcs, exact offsets") {
    val data = "hello tfrecord".getBytes("UTF-8")
    val enc = TFRecordIO.encodeRecord(data)
    assert(enc.length == 12 + data.length + 4)
    // length field: little-endian uint64 at offset 0
    val len = java.nio.ByteBuffer.wrap(enc, 0, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    assert(len == data.length.toLong)
    assert(enc.slice(12, 12 + data.length).sameElements(data))
    // a parser round-trip (with CRC verification) accepts it
    val back = TFRecordIO.readRecords(new ByteArrayInputStream(enc)).toSeq
    assert(back.size == 1 && back.head.sameElements(data))
    // empty record is legal (12 + 0 + 4 bytes)
    val empty = TFRecordIO.encodeRecord(Array.emptyByteArray)
    assert(empty.length == 16)
    assert(TFRecordIO.readRecords(new ByteArrayInputStream(empty)).toSeq.head.isEmpty)
  }

  test("tfrecord corruption: flipped data byte fails CRC; truncation throws") {
    val enc = TFRecordIO.encodeRecord("payload".getBytes("UTF-8"))
    val corrupt = enc.clone(); corrupt(14) = (corrupt(14) ^ 0x01).toByte
    intercept[IllegalArgumentException] {
      TFRecordIO.readRecords(new ByteArrayInputStream(corrupt)).toSeq
    }
    // verifyCrc=false recovers the (corrupted) payload instead
    val lax = TFRecordIO.readRecords(new ByteArrayInputStream(corrupt), verifyCrc = false).toSeq
    assert(lax.size == 1 && !lax.head.sameElements("payload".getBytes("UTF-8")))
    intercept[java.io.EOFException] {
      TFRecordIO.readRecords(new ByteArrayInputStream(enc.take(enc.length - 2))).toSeq
    }
  }

  test("tfrecord write/read round-trip: sharded commit, shard names, glob read") {
    val dir = tmp() + "/tfr"
    val records = (0 until 500).map(i => s"record-$i-${"x" * (i % 97)}")
    val df = records.toDF("s")
    val paths = TFRecordIO.write(df, col("s"), dir, numShards = 4)
    assert(paths.size == 4)
    // ignore the local-FS checksum sidecars (.part-*.crc)
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(names.toSeq == (0 until 4).map(i => f"part-$i%05d-of-00004.tfrecord"),
      names.mkString(","))
    // no temp residue from the commit protocol
    assert(!names.exists(_.startsWith("_temporary")))
    val back = TFRecordIO.read(spark, s"$dir/part-*")
      .select(col("record").cast("string")).as[String].collect()
    assert(back.length == 500 && back.toSet == records.toSet)
  }

  test("tfrecord read handles gzip-compressed files (CompressionType.AUTO)") {
    val dir = Files.createTempDirectory("graft-tfgz").toString
    val recs = Seq("alpha", "beta", "gamma").map(_.getBytes("UTF-8"))
    val raw = recs.flatMap(TFRecordIO.encodeRecord).toArray
    val f = new java.io.File(dir, "data.tfrecord.gz")
    val out = new GZIPOutputStream(new java.io.FileOutputStream(f))
    out.write(raw); out.close()
    val back = TFRecordIO.read(spark, f.getAbsolutePath)
      .select(col("record").cast("string")).as[String].collect().toSet
    assert(back == Set("alpha", "beta", "gamma"))
  }

  test("xml write/read round-trip via rowTag record splitting") {
    val dir = tmp() + "/xml"
    val df = Seq((1L, "ada", 3.5), (2L, "grace", 4.25), (3L, "edsger", 1.0))
      .toDF("id", "name", "score")
    XmlIO.write(df, dir, rootElement = "people", recordElement = "person")
    val back = XmlIO.read(spark, dir, recordElement = "person")
      .select(col("id").cast("long"), col("name"), col("score").cast("double"))
    assert(back.collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
    // the written document really uses the requested element names
    val text = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => new String(Files.readAllBytes(f.toPath), "UTF-8")).mkString
    assert(text.contains("<people>") && text.contains("<person>"))
  }

  test("avro container round-trip: rich schema incl. nulls, nesting, logical types") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = false),
      StructField("tags", ArrayType(IntegerType, containsNull = false), nullable = true),
      StructField("attrs", MapType(StringType, LongType, valueContainsNull = false), nullable = true),
      StructField("blob", BinaryType, nullable = true),
      StructField("born", DateType, nullable = true),
      StructField("seen", TimestampType, nullable = true),
      StructField("local_ts", TimestampNTZType, nullable = true),
      StructField("nested", StructType(Seq(
        StructField("lang", StringType, nullable = true),
        StructField("pages", IntegerType, nullable = false))), nullable = true)))
    val rows = Seq(
      Row(1L, "ada", 3.5, Seq(1, 2, 3), Map("a" -> 10L), Array[Byte](1, 2),
        java.sql.Date.valueOf("1815-12-10"),
        java.sql.Timestamp.valueOf("2024-06-01 12:34:56.123456"),
        java.time.LocalDateTime.parse("2024-06-01T12:34:56.123456"),
        Row("en", 240)),
      Row(2L, null, 0.25, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp() + "/avro"
    // 2 rows may round-robin into one partition; empty shards are skipped
    val paths = AvroFiles.write(df, dir, numShards = 2)
    assert(paths.nonEmpty && paths.forall(_.endsWith(".avro")))
    val back = AvroFiles.read(spark, dir)
    assert(back.schema == schema,
      s"schema mismatch:\n${back.schema}\n$schema")
    val gotSorted = back.collect().sortBy(_.getLong(0)).toSeq
    val expSorted = rows.sortBy(_.getLong(0))
    // binary needs element-wise comparison; compare field by field
    gotSorted.zip(expSorted).foreach { case (g, e) =>
      (0 until schema.size).foreach { i =>
        (g.get(i), e.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b))
          case (a, b) => assert(a == b, s"field ${schema(i).name}: $a != $b")
        }
      }
    }
  }

  test("avro read honors timestamp-millis from foreign writers (unit, not just type)") {
    import org.apache.avro.{LogicalTypes, Schema}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    // hand-write a container whose `seen` field is timestamp-MILLIS — our
    // writer always emits micros, so this exercises the foreign-unit path
    val rec = Schema.createRecord("ext", null, "ext.ns", false)
    val millisType = LogicalTypes.timestampMillis()
      .addToSchema(Schema.create(Schema.Type.LONG))
    rec.setFields(java.util.List.of(
      new Schema.Field("id", Schema.create(Schema.Type.LONG), null, null),
      new Schema.Field("seen", millisType, null, null)))
    val dir = new java.io.File(Files.createTempDirectory("graft-avms").toFile, "d")
    dir.mkdirs()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](rec))
    w.create(rec, new java.io.File(dir, "part-ext.avro"))
    val millis = java.sql.Timestamp.valueOf("2024-06-01 12:34:56.123").getTime
    val r = new GenericData.Record(rec)
    r.put("id", 7L); r.put("seen", millis)
    w.append(r); w.close()
    val back = AvroFiles.read(spark, dir.getAbsolutePath).collect()
    assert(back.length == 1)
    assert(back.head.getAs[java.sql.Timestamp]("seen").getTime == millis,
      s"timestamp-millis decoded wrong: ${back.head.getAs[java.sql.Timestamp]("seen")}")
  }

  test("avro write survives same-named sibling structs (path-qualified record names)") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    // two different structs both under a field named `meta` used to
    // collide in Avro's global name table ("Can't redefine")
    val schema = StructType(Seq(
      StructField("a", StructType(Seq(StructField("meta",
        StructType(Seq(StructField("x", IntegerType, false))), false))), nullable = false),
      StructField("b", StructType(Seq(StructField("meta",
        StructType(Seq(StructField("y", LongType, false))), false))), nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Row(Row(1)), Row(Row(2L))))), schema)
    val dir = tmp() + "/avdup"
    AvroFiles.write(df, dir)
    val back = AvroFiles.read(spark, dir).collect()
    assert(back.head.getStruct(0).getStruct(0).getInt(0) == 1)
    assert(back.head.getStruct(1).getStruct(0).getLong(0) == 2L)
  }

  test("sharded commit overwrites a prior generation (no stale part files on rerun)") {
    val dir = tmp() + "/rewrite"
    val big = (0 until 100).map(i => s"old-$i").toDF("s")
    TFRecordIO.write(big, col("s"), dir, numShards = 4)
    // rerun with FEWER shards: old part-0000{2,3}-of-00004 must not survive
    val small = Seq("new-a", "new-b").toDF("s")
    TFRecordIO.write(small, col("s"), dir, numShards = 1)
    val back = TFRecordIO.read(spark, s"$dir/part-*")
      .select(col("record").cast("string")).as[String].collect().toSet
    assert(back == Set("new-a", "new-b"), s"stale shards leaked: ${back.size} records")
  }

  test("tfrecord write rejects null records with a named error") {
    val dir = tmp() + "/tfnull"
    val df = Seq(Some("x"), None).toDF("s")
    val e = intercept[Exception] { TFRecordIO.write(df, col("s"), dir) }
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("null record")), messages.mkString(" | "))
  }

  test("avro schema mapping is an involution on the supported subset") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("l", LongType, nullable = true),
      StructField("arr", ArrayType(StringType, containsNull = true), nullable = false),
      StructField("m", MapType(StringType, DoubleType, valueContainsNull = true), nullable = true),
      StructField("rec", StructType(Seq(StructField("x", BooleanType, nullable = false))), nullable = false)))
    val (roundTrip, _) = AvroFiles.toCatalyst(AvroFiles.structToAvro(st, "t"))
    assert(roundTrip == st)
    // decimals are a documented unsupported type
    intercept[UnsupportedOperationException] {
      AvroFiles.toAvroSchema(DecimalType(10, 2), "d", nullable = false)
    }
  }

  test("avro sync-marker split read: many tiny splits see each record exactly once") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val dir = Files.createTempDirectory("graft-avro-split").toFile
    val schema: Schema = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("payload").endRecord()
    val f = new java.io.File(dir, "big.avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(64) // force MANY blocks so splits land mid-file
    w.create(schema, f)
    val n = 2000
    (0 until n).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong); rec.put("payload", s"row-$i-payload")
      w.append(rec)
    }
    w.close()
    // split far smaller than the file: every split boundary falls inside
    // blocks; the sync/pastSync contract must still assign each block to
    // exactly one split (no loss at boundaries, no double-reads)
    val back = AvroFiles.read(spark, f.getAbsolutePath, splitSizeBytes = 512)
    val ids = back.select("id").as[Long].collect().sorted
    assert(ids.length == n, s"got ${ids.length} rows")
    assert(ids.toSeq == (0L until n.toLong), "each record exactly once")
    // and the default (maxPartitionBytes) path still reads it whole
    assert(AvroFiles.read(spark, f.getAbsolutePath).count() == n)
  }

  test("xml read with explicit schema and nested records") {
    val dir = tmp() + "/xmlnest"
    val f = new java.io.File(dir); f.mkdirs()
    val doc =
      """<catalog>
        |  <book><id>1</id><meta><lang>en</lang><pages>240</pages></meta></book>
        |  <book><id>2</id><meta><lang>fr</lang><pages>312</pages></meta></book>
        |</catalog>""".stripMargin
    Files.write(new java.io.File(f, "books.xml").toPath, doc.getBytes("UTF-8"))
    val back = XmlIO.read(spark, f.getAbsolutePath + "/books.xml", "book")
    assert(back.count() == 2)
    assert(back.select(col("meta.lang")).as[String].collect().toSet == Set("en", "fr"))
  }
}
