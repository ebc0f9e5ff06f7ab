package graft.coders

import java.io.ByteArrayOutputStream

/** Protocol Buffers wire-format primitives, hand-implemented from the
  * public encoding spec (https://protobuf.dev/programming-guides/encoding/).
  *
  * Closes the reference's ProtoCoder capability
  * (sdks/java/extensions/protobuf/.../ProtoCoder.java:49 — "A Coder using
  * Google Protocol Buffers binary format", syntax 2 and 3) without the
  * generated `Message` classes that are absent from this container: the
  * wire format is message-schema-agnostic (tag = field<<3 | wireType), so a
  * generic field walker plus schema-driven interpretation reproduces the
  * byte-level contract. [[TfExample]] builds the tf.train.Example schema on
  * top of this; arbitrary flat schemas ride the same primitives.
  *
  * Determinism note (ProtoCoder.java:84-105 "ProtoCoder and Determinism"):
  * the reference's coder is only deterministic when the message has no map
  * fields; our encoders sort map entries by key, which is strictly
  * stronger and makes encoded bytes safe to group/dedup on.
  */
object ProtoWire {

  // wire types (public spec §"Message Structure")
  final val WtVarint  = 0
  final val WtFixed64 = 1
  final val WtLen     = 2
  final val WtFixed32 = 5

  // ------------------------------------------------------------ varint

  /** Unsigned LEB128, low 7 bits first; ≤10 bytes for a 64-bit value. */
  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Decode a varint at `off`; returns (value, bytesConsumed). Throws on
    * >10 bytes or truncation — malformed input must fail loud, never wrap
    * the shift and OR garbage into the value. */
  def readVarint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var i = off
    while (true) {
      if (i >= b.length) throw new IllegalArgumentException(
        s"truncated varint at offset $off")
      if (shift >= 70) throw new IllegalArgumentException(
        s"malformed varint at offset $off: more than 10 bytes")
      val byte = b(i); i += 1
      v |= (byte & 0x7fL) << shift
      if ((byte & 0x80) == 0) return (v, i - off)
      shift += 7
    }
    throw new IllegalStateException("unreachable")
  }

  /** ZigZag for sint32/sint64 (spec §"Signed Integers"). */
  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  // ------------------------------------------------------------ fields

  def writeTag(out: ByteArrayOutputStream, field: Int, wireType: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wireType)

  def writeVarintField(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeTag(out, field, WtVarint); writeVarint(out, v)
  }

  def writeLenField(out: ByteArrayOutputStream, field: Int, bytes: Array[Byte]): Unit = {
    writeTag(out, field, WtLen); writeVarint(out, bytes.length.toLong)
    out.write(bytes, 0, bytes.length)
  }

  def writeStringField(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    writeLenField(out, field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** One decoded field occurrence. For LEN fields the payload is
    * bytes[off, off+len); for VARINT/FIXED the value is in `varint` (fixed
    * values as raw little-endian bits). */
  final case class Field(number: Int, wireType: Int, varint: Long,
                         off: Int, len: Int) {
    def slice(bytes: Array[Byte]): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, off, off + len)
  }

  /** Walk every field occurrence in bytes[start, end). Unknown fields are
    * the CALLER's job to skip (the spec requires parsers to tolerate
    * them — this walker already consumes their payloads correctly).
    * Group wire types (3/4, proto2 deprecated) are rejected loudly. */
  def fields(bytes: Array[Byte], start: Int, end: Int): Iterator[Field] =
    new Iterator[Field] {
      private var pos = start
      def hasNext: Boolean = pos < end
      def next(): Field = {
        val (tag, tc) = readVarint(bytes, pos)
        pos += tc
        val number = (tag >>> 3).toInt
        val wt = (tag & 7).toInt
        if (number == 0) throw new IllegalArgumentException(
          s"invalid field number 0 at offset ${pos - tc}")
        wt match {
          case WtVarint =>
            val (v, c) = readVarint(bytes, pos); pos += c
            Field(number, wt, v, pos - c, c)
          case WtFixed64 =>
            if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
            var v = 0L; var i = 7
            while (i >= 0) { v = (v << 8) | (bytes(pos + i) & 0xffL); i -= 1 }
            pos += 8; Field(number, wt, v, pos - 8, 8)
          case WtFixed32 =>
            if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
            var v = 0L; var i = 3
            while (i >= 0) { v = (v << 8) | (bytes(pos + i) & 0xffL); i -= 1 }
            pos += 4; Field(number, wt, v, pos - 4, 4)
          case WtLen =>
            val (len, c) = readVarint(bytes, pos); pos += c
            if (len < 0 || pos + len > end) throw new IllegalArgumentException(
              s"length-delimited field $number overruns message: len=$len")
            val f = Field(number, wt, len, pos, len.toInt)
            pos += len.toInt; f
          case other => throw new IllegalArgumentException(
            s"unsupported wire type $other for field $number (proto2 groups " +
              "are deprecated and unsupported)")
        }
      }
    }

  def fields(bytes: Array[Byte]): Iterator[Field] = fields(bytes, 0, bytes.length)
}
