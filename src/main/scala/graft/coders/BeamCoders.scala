package graft.coders

import java.io.{ByteArrayOutputStream, DataOutputStream}

/** Beam's standard wire coders (reference: SDK/coders/VarLongCoder.java,
  * InstantCoder.java, KvCoder.java, IterableCoder.java,
  * SDK/transforms/windowing/IntervalWindow.java getCoder; golden vectors
  * sdks/common/fn-api/.../standard_coders.yaml). Inside the engine Spark's
  * Tungsten encoders own the data plane (SURVEY §3.1 — the coder machinery
  * is subsumed), so these exist for the INTEROP boundary: writing/reading
  * byte streams a Beam pipeline (any SDK) produces or consumes. Validated
  * byte-for-byte against the reference's cross-SDK golden vectors in
  * CoderGoldenVectorSpec.
  *
  * Context matters, as in Beam: `nested = true` adds the element-boundary
  * framing (length prefix for bytes) that outer coders need.
  */
object BeamCoders {

  // ------------------------------------------------------------- varint
  /** Beam VarInt (VarLongCoder): little-endian base-128, 7 bits per byte,
    * high bit = continuation; negatives take the full 10 bytes. */
  def encodeVarLong(v: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var x = v
    while ((x & ~0x7FL) != 0) {
      out.write(((x & 0x7F) | 0x80).toInt)
      x >>>= 7
    }
    out.write(x.toInt & 0x7F)
    out.toByteArray
  }

  /** Decode a VarInt starting at `off`; returns (value, bytesRead).
    * Rejects overlong encodings (> 10 bytes) like the reference's
    * VarInt.decodeLong — a silent wrap of the shift amount would OR garbage
    * into the value AND desynchronize every later field in the buffer. */
  def decodeVarLong(bytes: Array[Byte], off: Int = 0): (Long, Int) = {
    var shift = 0; var i = off; var acc = 0L
    while ({
      if (shift >= 70)
        throw new IllegalArgumentException("malformed varint: more than 10 bytes")
      val b = bytes(i) & 0xFF
      acc |= (b & 0x7FL) << shift
      shift += 7; i += 1
      (b & 0x80) != 0
    }) ()
    (acc, i - off)
  }

  // ------------------------------------------------------------- bytes
  /** ByteArrayCoder: raw in the outer context, varint-length-prefixed when
    * nested (the element boundary an outer coder needs). */
  def encodeBytes(b: Array[Byte], nested: Boolean): Array[Byte] =
    if (!nested) b else encodeVarLong(b.length.toLong) ++ b

  /** Like the varint guard above, a malformed length must throw, not
    * corrupt: `len.toInt` would wrap past Int.MaxValue and `slice` would
    * silently clamp on a truncated buffer, yielding bad data AND a
    * desynced offset for every later field. */
  def decodeBytes(bytes: Array[Byte], off: Int, nested: Boolean): (Array[Byte], Int) =
    if (!nested) (bytes.drop(off), bytes.length - off)
    else {
      val (len, ln) = decodeVarLong(bytes, off)
      if (len < 0 || len > Int.MaxValue)
        throw new IllegalArgumentException(s"malformed byte-array length: $len")
      if (off + ln + len > bytes.length)
        throw new IllegalArgumentException(
          s"truncated byte-array: declared $len bytes, " +
            s"${bytes.length - off - ln} available")
      (bytes.slice(off + ln, off + ln + len.toInt), ln + len.toInt)
    }

  // ------------------------------------------------------------- instant
  /** InstantCoder: epoch millis shifted by Long.MinValue and written
    * big-endian, so byte-wise lexicographic order equals chronological
    * order (the property shuffle-grouping relies on). */
  def encodeInstant(millis: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    new DataOutputStream(out).writeLong(millis - Long.MinValue)
    out.toByteArray
  }

  def decodeInstant(bytes: Array[Byte], off: Int = 0): Long = {
    var acc = 0L
    (0 until 8).foreach(i => acc = (acc << 8) | (bytes(off + i) & 0xFFL))
    acc + Long.MinValue
  }

  // ------------------------------------------------------------- windows
  /** IntervalWindow coder: big-endian shifted END instant, then the span
    * (end − start) as a varint — the YAML's {end, span} shape. */
  def encodeIntervalWindow(endMillis: Long, spanMillis: Long): Array[Byte] =
    encodeInstant(endMillis) ++ encodeVarLong(spanMillis)

  def decodeIntervalWindow(bytes: Array[Byte], off: Int = 0): (Long, Long) = {
    val end = decodeInstant(bytes, off)
    val (span, _) = decodeVarLong(bytes, off + 8)
    (end, span)
  }

  // ------------------------------------------------------------- kv
  /** KvCoder: key encoded NESTED (it needs a boundary), value in the
    * caller's context. */
  def encodeKv(key: Array[Byte], valueEnc: Array[Byte]): Array[Byte] =
    encodeBytes(key, nested = true) ++ valueEnc

  // ------------------------------------------------------------- stream
  /** IterableCoder, known-size form: 4-byte big-endian count, then each
    * element encoded nested. */
  def encodeStream(elements: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.writeInt(elements.size)
    elements.foreach(out.write)
    out.toByteArray
  }

  /** IterableCoder, UNKNOWN-size form (IterableLikeCoder.java:105-112 via
    * BufferedElementCountingOutputStream): int32 -1, then batches of
    * (varint elementCount, elements…), terminated by varint 0. Any
    * batching is legal on encode (the reference buffers ~64 KB per
    * batch); decoders must accept all of them. */
  def encodeStreamUnknown(elements: Seq[Array[Byte]],
                          batchElements: Int = 100): Array[Byte] = {
    require(batchElements > 0)
    val out = new ByteArrayOutputStream()
    new DataOutputStream(out).writeInt(-1)
    elements.grouped(batchElements).foreach { g =>
      out.write(encodeVarLong(g.size.toLong))
      g.foreach(out.write)
    }
    out.write(encodeVarLong(0L))
    out.toByteArray
  }

  /** Decode either stream form (IterableLikeCoder.java:126-141), given the
    * element decoder `dec(bytes, off) => (value, bytesRead)`. Returns
    * (elements, totalBytesRead). */
  def decodeStream[A](bytes: Array[Byte], off: Int,
                      dec: (Array[Byte], Int) => (A, Int)): (Seq[A], Int) = {
    var i = off
    val n = (0 until 4).foldLeft(0)((acc, k) => (acc << 8) | (bytes(i + k) & 0xFF))
    i += 4
    val acc = Seq.newBuilder[A]
    if (n >= 0) {
      (0 until n).foreach { _ =>
        val (v, used) = dec(bytes, i); acc += v; i += used
      }
    } else {
      // batched form: each varint is the element count of the next batch;
      // a zero count terminates the stream
      var count = { val (c, used) = decodeVarLong(bytes, i); i += used; c }
      while (count > 0L) {
        val (v, used) = dec(bytes, i); acc += v; i += used
        count -= 1
        if (count == 0L) {
          val (c, used) = decodeVarLong(bytes, i); i += used; count = c
        }
      }
    }
    (acc.result(), i - off)
  }
}
