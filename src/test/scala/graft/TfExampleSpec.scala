package graft

import org.apache.spark.sql.{Row, functions => F}
import org.apache.spark.sql.types._

import graft.coders.{ProtoWire, TfExample}
import graft.coders.TfExample._
import graft.sources.TfExampleIO

/** Wire-level and Spark-level checks for the hand-rolled protobuf codec
  * (reference capability: ProtoCoder.java:49). Golden bytes are computed by
  * hand from the public encoding spec, so a decoder bug can't hide behind a
  * matching encoder bug. */
class TfExampleSpec extends SparkSpec {

  test("varint round-trip incl. boundary values") {
    val vals = Seq(0L, 1L, 127L, 128L, 300L, Long.MaxValue, -1L, Long.MinValue)
    vals.foreach { v =>
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeVarint(out, v)
      val bytes = out.toByteArray
      val (dec, n) = ProtoWire.readVarint(bytes, 0)
      assert(dec == v && n == bytes.length, s"varint $v")
    }
    // -1 (all bits set) is the canonical 10-byte varint
    val out = new java.io.ByteArrayOutputStream()
    ProtoWire.writeVarint(out, -1L)
    assert(out.toByteArray.length == 10)
    // 300 = 0xAC 0x02 (spec's own worked example)
    val o2 = new java.io.ByteArrayOutputStream()
    ProtoWire.writeVarint(o2, 300L)
    assert(o2.toByteArray.toSeq == Seq(0xAC.toByte, 0x02.toByte))
  }

  test("varint malformed input fails loud") {
    intercept[IllegalArgumentException] { // truncated: continuation bit set at EOF
      ProtoWire.readVarint(Array(0x80.toByte), 0)
    }
    intercept[IllegalArgumentException] { // 11 bytes of continuation
      ProtoWire.readVarint(Array.fill(11)(0x80.toByte), 0)
    }
  }

  test("zigzag matches the spec table") {
    // spec: 0→0, -1→1, 1→2, -2→3, 2147483647→4294967294
    assert(ProtoWire.zigzag(0L) == 0L && ProtoWire.zigzag(-1L) == 1L &&
      ProtoWire.zigzag(1L) == 2L && ProtoWire.zigzag(-2L) == 3L &&
      ProtoWire.zigzag(2147483647L) == 4294967294L)
    Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue).foreach(v =>
      assert(ProtoWire.unzigzag(ProtoWire.zigzag(v)) == v))
  }

  test("Example golden bytes: single int64 feature, hand-computed") {
    // Example{features{feature{key:"a" value{int64_list{value:[3]}}}}}
    // Int64List: 0A 01 03 (3B) | Feature: 1A 03 +that (5B) | map entry:
    // key 0A 01 61 + value 12 05 +feature (10B) | Features: 0A 0A +entry
    // (12B) | Example: 0A 0C +features (14B)
    val golden = Array(
      0x0A, 0x0C, 0x0A, 0x0A, 0x0A, 0x01, 0x61, 0x12,
      0x05, 0x1A, 0x03, 0x0A, 0x01, 0x03).map(_.toByte)
    val enc = TfExample.encode(Seq("a" -> Int64ListF(Vector(3L))))
    assert(enc.toSeq == golden.toSeq,
      s"got ${enc.map(b => f"$b%02X").mkString(" ")}")
    assert(TfExample.decode(golden) == Map("a" -> Int64ListF(Vector(3L))))
  }

  test("Example golden bytes: packed float feature, hand-computed") {
    // FloatList([1.5f]) packed: 0A 04 00 00 C0 3F (6B, LE bits 0x3FC00000)
    // Feature.float_list (field 2): 12 06 +that (8B) | map entry: key
    // 0A 01 66 + value 12 08 +feature (13B) | Features: 0A 0D +entry
    // (15B) | Example: 0A 0F +features (17B)
    val golden = Array(
      0x0A, 0x0F, 0x0A, 0x0D, 0x0A, 0x01, 0x66, 0x12, 0x08,
      0x12, 0x06, 0x0A, 0x04, 0x00, 0x00, 0xC0, 0x3F
    ).map(_.toByte)
    val enc = TfExample.encode(Seq("f" -> FloatListF(Vector(1.5f))))
    assert(enc.toSeq == golden.toSeq,
      s"got ${enc.map(b => f"$b%02X").mkString(" ")}")
    assert(TfExample.decode(golden) == Map("f" -> FloatListF(Vector(1.5f))))
  }

  test("decode accepts UNPACKED scalar encodings (spec-required tolerance)") {
    // Int64List{value:[5,6]} unpacked: two varint fields #1: 08 05 08 06
    val int64Unpacked = Array(0x08, 0x05, 0x08, 0x06).map(_.toByte)
    val feature = { // Feature{int64_list{...}}
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeLenField(out, 3, int64Unpacked); out.toByteArray
    }
    val entry = {
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeStringField(out, 1, "n")
      ProtoWire.writeLenField(out, 2, feature); out.toByteArray
    }
    val ex = {
      val fs = new java.io.ByteArrayOutputStream()
      ProtoWire.writeLenField(fs, 1, entry)
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeLenField(out, 1, fs.toByteArray); out.toByteArray
    }
    assert(TfExample.decode(ex) == Map("n" -> Int64ListF(Vector(5L, 6L))))

    // FloatList unpacked: fixed32 fields #1 (wire type 5): 0D 00 00 C0 3F
    val floatUnpacked = Array(0x0D, 0x00, 0x00, 0xC0, 0x3F).map(_.toByte)
    val ffeature = {
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeLenField(out, 2, floatUnpacked); out.toByteArray
    }
    val fentry = {
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeStringField(out, 1, "g")
      ProtoWire.writeLenField(out, 2, ffeature); out.toByteArray
    }
    val fex = {
      val fs = new java.io.ByteArrayOutputStream()
      ProtoWire.writeLenField(fs, 1, fentry)
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeLenField(out, 1, fs.toByteArray); out.toByteArray
    }
    assert(TfExample.decode(fex) == Map("g" -> FloatListF(Vector(1.5f))))
  }

  test("decode skips unknown fields at every nesting level") {
    val base = TfExample.encode(Seq("a" -> Int64ListF(Vector(7L))))
    // append an unknown top-level field #9 (varint) and #10 (len-delimited)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, base.length)
    ProtoWire.writeVarintField(out, 9, 42L)
    ProtoWire.writeLenField(out, 10, Array[Byte](1, 2, 3))
    assert(TfExample.decode(out.toByteArray) == Map("a" -> Int64ListF(Vector(7L))))
  }

  test("encode is deterministic: feature order does not change bytes") {
    val a = TfExample.encode(Seq(
      "z" -> Int64ListF(Vector(1L)), "a" -> BytesListF(Vector("x".getBytes))))
    val b = TfExample.encode(Seq(
      "a" -> BytesListF(Vector("x".getBytes)), "z" -> Int64ListF(Vector(1L))))
    assert(a.toSeq == b.toSeq)
  }

  test("schema round-trip: scalars, arrays, nulls, double narrowing") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("toks", ArrayType(StringType)),
      StructField("vec", ArrayType(FloatType)), StructField("blob", BinaryType)))
    val rows = Seq(
      Row(1L, "hello", 2.5, Seq("a", "b"), Seq(1.0f, -0.5f), Array[Byte](9, 8)),
      Row(2L, null, 0.125, Seq.empty[String], null, null))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    val back = TfExampleIO.decodeBytes(TfExampleIO.encodeRows(df), schema)
      .collect().sortBy(_.getLong(0))
    assert(back.length == 2)
    assert(back(0).getString(1) == "hello" && back(0).getDouble(2) == 2.5)
    assert(back(0).getSeq[String](3) == Seq("a", "b"))
    assert(back(0).getSeq[Float](4) == Seq(1.0f, -0.5f))
    assert(back(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](9, 8))
    assert(back(1).isNullAt(1) && back(1).isNullAt(4) && back(1).isNullAt(5))
    // present-but-empty string array survives as empty (bytes_list kind kept)
    assert(back(1).getSeq[String](3) == Seq.empty[String])
    // double 0.125 is dyadic → survives the float32 wire exactly
    assert(back(1).getDouble(2) == 0.125)
  }

  test("tfrecord-of-example file round-trip through write/read") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    import scala.jdk.CollectionConverters._
    val rows = (1L to 50L).map(i => Row(i, s"document number $i")).asJava
    val df = spark.createDataFrame(rows, schema)
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-tfex").toString
    try {
      val paths = TfExampleIO.write(df, dir, numShards = 3)
      assert(paths.size == 3 && paths.forall(_.contains("-of-00003")))
      val back = TfExampleIO.read(spark, s"$dir/part-*", schema)
      assert(back.count() == 50)
      assert(back.orderBy("doc_id").collect().map(_.getString(1)).take(3).toSeq ==
        Seq("document number 1", "document number 2", "document number 3"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("SequenceExample round-trip: context + ordered per-step feature lists") {
    val ctx = Seq(
      "doc_id" -> Int64ListF(Vector(42L)),
      "title" -> BytesListF(Vector("clip".getBytes("UTF-8"))))
    val lists = Seq(
      "frames" -> Seq(FloatListF(Vector(0.1f, 0.2f)), FloatListF(Vector(0.3f, 0.4f)),
        FloatListF(Vector.empty)),
      "tokens" -> Seq(Int64ListF(Vector(7L)), Int64ListF(Vector(8L, 9L))))
    val bytes = TfExample.encodeSequence(ctx, lists)
    val (dcx, dls) = TfExample.decodeSequence(bytes)
    assert(dcx("doc_id") == Int64ListF(Vector(42L)))
    assert(new String(dcx("title").asInstanceOf[BytesListF].values.head) == "clip")
    // step ORDER is the contract
    assert(dls("frames") == Vector(FloatListF(Vector(0.1f, 0.2f)),
      FloatListF(Vector(0.3f, 0.4f)), FloatListF(Vector.empty)))
    assert(dls("tokens") == Vector(Int64ListF(Vector(7L)), Int64ListF(Vector(8L, 9L))))
  }

  test("SequenceExample: empty context and empty lists survive; unknown fields skipped") {
    val bytes = TfExample.encodeSequence(Nil, Seq("steps" -> Nil))
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, bytes.length)
    ProtoWire.writeVarintField(out, 15, 99L) // unknown top-level field
    val (ctx, lists) = TfExample.decodeSequence(out.toByteArray)
    assert(ctx.isEmpty && lists == Map("steps" -> Vector.empty))
  }

  test("kind mismatch fails loud with the feature name") {
    val bytes = TfExample.encode(Seq("x" -> FloatListF(Vector(1f))))
    val ask = StructType(Seq(StructField("x", LongType)))
    val e = intercept[IllegalArgumentException] {
      TfExampleIO.decodeToRow(ask, bytes)
    }
    assert(e.getMessage.contains("`x`"))
  }
}
