package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.coders.BeamCoders._

/** Byte-for-byte conformance against the reference's cross-SDK coder golden
  * vectors (reference:
  * sdks/common/fn-api/src/test/resources/org/apache/beam/fn/v1/standard_coders.yaml
  * — the same corpus every Beam SDK validates its wire coders against).
  * Vectors are transcribed verbatim; each `\uXXXX` escape in the YAML is one
  * byte here. */
class CoderGoldenVectorSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("varint vectors: 0, 1, 10, 200, 1000, -1") {
    assert(encodeVarLong(0L).sameElements(bytes(0x00)))
    assert(encodeVarLong(1L).sameElements(bytes(0x01)))
    assert(encodeVarLong(10L).sameElements(bytes(0x0A)))
    assert(encodeVarLong(200L).sameElements(bytes(0xC8, 0x01)))
    assert(encodeVarLong(1000L).sameElements(bytes(0xE8, 0x07)))
    assert(encodeVarLong(-1L).sameElements(
      bytes(0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0x01)))
    // round trip incl. the 10-byte negative form
    Seq(0L, 1L, 10L, 200L, 1000L, -1L, Long.MaxValue, Long.MinValue).foreach { v =>
      assert(decodeVarLong(encodeVarLong(v))._1 == v, s"round trip $v")
    }
  }

  test("bytes vectors: raw outer, varint-length-prefixed nested") {
    assert(encodeBytes(ascii("abc"), nested = false).sameElements(ascii("abc")))
    assert(encodeBytes(ascii("ab\u0000c"), nested = false).sameElements(ascii("ab\u0000c")))
    assert(encodeBytes(ascii("abc"), nested = true).sameElements(bytes(0x03) ++ ascii("abc")))
    assert(encodeBytes(ascii("ab\u0000c"), nested = true).sameElements(bytes(0x04) ++ ascii("ab\u0000c")))
    // the 200-byte example exercises a two-byte varint length prefix
    val long200 = (1 to 20).map(i => f"${i * 10}%9d|").mkString
    assert(long200.length == 200)
    assert(encodeBytes(ascii(long200), nested = true)
      .sameElements(bytes(0xC8, 0x01) ++ ascii(long200)))
    val (dec, _) = decodeBytes(encodeBytes(ascii(long200), nested = true), 0, nested = true)
    assert(dec.sameElements(ascii(long200)))
  }

  test("kv vectors: bytes key nested + varint / bytes value per context") {
    assert(encodeKv(ascii("abc"), encodeVarLong(0L))
      .sameElements(bytes(0x03) ++ ascii("abc") ++ bytes(0x00)))
    assert(encodeKv(ascii("ab\u0000c"), encodeVarLong(10L))
      .sameElements(bytes(0x04) ++ ascii("ab\u0000c") ++ bytes(0x0A)))
    // kv<bytes, bytes> outer: value raw; nested: value length-prefixed
    assert(encodeKv(ascii("abc"), encodeBytes(ascii("def"), nested = false))
      .sameElements(bytes(0x03) ++ ascii("abcdef")))
    assert(encodeKv(ascii("abc"), encodeBytes(ascii("def"), nested = true))
      .sameElements(bytes(0x03) ++ ascii("abc") ++ bytes(0x03) ++ ascii("def")))
  }

  test("interval_window vectors: shifted big-endian end + varint span") {
    assert(encodeIntervalWindow(1454293425000L, 3600000L).sameElements(
      bytes(0x80, 0x00, 0x01, 0x52, 0x9A, 0xA4, 0x9B, 0x68, 0x80, 0xDD, 0xDB, 0x01)))
    assert(encodeIntervalWindow(1456881825000L, 2592000000L).sameElements(
      bytes(0x80, 0x00, 0x01, 0x53, 0x34, 0xEC, 0x74, 0xE8, 0x80, 0x90, 0xFB, 0xD3, 0x09)))
    assert(encodeIntervalWindow(-9223372036854410L, 365L).sameElements(
      bytes(0x7F, 0xDF, 0x3B, 0x64, 0x5A, 0x1C, 0xAD, 0x76, 0xED, 0x02)))
    assert(encodeIntervalWindow(9223372036854775L, 0L).sameElements(
      bytes(0x80, 0x20, 0xC4, 0x9B, 0xA5, 0xE3, 0x53, 0xF7, 0x00)))
    Seq((1454293425000L, 3600000L), (-9223372036854410L, 365L)).foreach { case (e, s) =>
      assert(decodeIntervalWindow(encodeIntervalWindow(e, s)) == ((e, s)))
    }
  }

  test("stream vectors: 4-byte big-endian count + nested elements") {
    assert(encodeStream(Seq(encodeVarLong(0L)))
      .sameElements(bytes(0x00, 0x00, 0x00, 0x01, 0x00)))
    assert(encodeStream(Seq(1L, 10L, 200L, 1000L).map(encodeVarLong))
      .sameElements(bytes(0x00, 0x00, 0x00, 0x04, 0x01, 0x0A, 0xC8, 0x01, 0xE8, 0x07)))
    assert(encodeStream(Seq.empty).sameElements(bytes(0x00, 0x00, 0x00, 0x00)))
  }

  test("instant ordering property: byte-lexicographic equals chronological") {
    val ts = Seq(Long.MinValue, -1L, 0L, 1L, 1454293425000L, Long.MaxValue)
    val enc = ts.map(encodeInstant)
    val lex = enc.sortWith { (a, b) =>
      a.zip(b).find { case (x, y) => x != y }
        .exists { case (x, y) => (x & 0xFF) < (y & 0xFF) }
    }
    assert(lex.map(decodeInstant(_)) == ts.sorted)
  }

  test("overlong varints are rejected, not silently wrapped") {
    val overlong = Array.fill(11)(0x80.toByte) :+ 0x01.toByte
    intercept[IllegalArgumentException] { decodeVarLong(overlong) }
  }

  test("unknown-size stream form: -1 marker + counted batches + zero terminator") {
    val elems = Seq(1L, 10L, 200L, 1000L).map(encodeVarLong)
    // exact bytes with batches of 2: -1, (2, 0x01 0x0A), (2, 0xC8 01 0xE8 07), 0
    assert(encodeStreamUnknown(elems, batchElements = 2).sameElements(
      bytes(0xFF, 0xFF, 0xFF, 0xFF, 0x02, 0x01, 0x0A,
            0x02, 0xC8, 0x01, 0xE8, 0x07, 0x00)))
    // any batching decodes identically; the empty stream is just -1, 0
    for (b <- Seq(1, 2, 3, 100)) {
      val (got, used) = decodeStream(encodeStreamUnknown(elems, b), 0, decodeVarLong)
      assert(got == Seq(1L, 10L, 200L, 1000L) && used == encodeStreamUnknown(elems, b).length)
    }
    assert(encodeStreamUnknown(Seq.empty).sameElements(
      bytes(0xFF, 0xFF, 0xFF, 0xFF, 0x00)))
    // the known-size form decodes through the same entry point
    val (known, _) = decodeStream(encodeStream(elems), 0, decodeVarLong)
    assert(known == Seq(1L, 10L, 200L, 1000L))
  }

  test("truncated / oversized nested byte-arrays are rejected, not clamped") {
    // declares 10 bytes, provides 3: slice would silently clamp
    val truncated = bytes(0x0A) ++ ascii("abc")
    intercept[IllegalArgumentException] { decodeBytes(truncated, 0, nested = true) }
    // length > Int.MaxValue: .toInt would wrap negative
    val huge = encodeVarLong(Int.MaxValue.toLong + 1) ++ ascii("abc")
    intercept[IllegalArgumentException] { decodeBytes(huge, 0, nested = true) }
    // a valid prefix still decodes when trailing bytes follow
    val (dec, used) = decodeBytes(bytes(0x03) ++ ascii("abcXYZ"), 0, nested = true)
    assert(dec.sameElements(ascii("abc")) && used == 4)
  }
}
