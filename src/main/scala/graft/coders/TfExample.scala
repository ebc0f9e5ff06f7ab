package graft.coders

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import graft.coders.ProtoWire._

/** tf.train.Example codec over [[ProtoWire]] — the de-facto standard
  * training-data record format (TFRecord of tf.Example). Schema is the
  * public tensorflow/core/example/{example,feature}.proto:
  *
  * {{{
  * message Example  { Features features = 1; }
  * message Features { map<string, Feature> feature = 1; }
  * message Feature  { oneof kind {
  *   BytesList bytes_list = 1; FloatList float_list = 2; Int64List int64_list = 3; } }
  * message BytesList { repeated bytes value = 1; }
  * message FloatList { repeated float value = 1 [packed = true]; }
  * message Int64List { repeated int64 value = 1 [packed = true]; }
  * }}}
  *
  * Encoder writes canonical proto3 (packed scalars, map entries sorted by
  * key → deterministic bytes, see [[ProtoWire]] determinism note); decoder
  * additionally accepts unpacked scalar encodings and skips unknown
  * fields, as the spec requires of all conforming parsers.
  */
object TfExample {

  sealed trait TfFeature
  final case class BytesListF(values: Vector[Array[Byte]]) extends TfFeature
  final case class FloatListF(values: Vector[Float]) extends TfFeature
  final case class Int64ListF(values: Vector[Long]) extends TfFeature

  // ------------------------------------------------------------- encode

  private def encodeFeature(f: TfFeature): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    f match {
      case BytesListF(vs) =>
        val inner = new ByteArrayOutputStream()
        vs.foreach(b => writeLenField(inner, 1, b))
        writeLenField(out, 1, inner.toByteArray)          // Feature.bytes_list
      case FloatListF(vs) =>
        val inner = new ByteArrayOutputStream()
        if (vs.nonEmpty) {                                 // packed floats
          val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
          vs.foreach(bb.putFloat)
          writeLenField(inner, 1, bb.array())
        }
        writeLenField(out, 2, inner.toByteArray)          // Feature.float_list
      case Int64ListF(vs) =>
        val inner = new ByteArrayOutputStream()
        if (vs.nonEmpty) {                                 // packed varints
          val packed = new ByteArrayOutputStream()
          vs.foreach(writeVarint(packed, _))
          writeLenField(inner, 1, packed.toByteArray)
        }
        writeLenField(out, 3, inner.toByteArray)          // Feature.int64_list
    }
    out.toByteArray
  }

  /** Example bytes for the given features; entries sorted by key so equal
    * feature maps always encode to equal bytes. */
  def encode(features: Seq[(String, TfFeature)]): Array[Byte] = {
    val fs = new ByteArrayOutputStream()
    features.sortBy(_._1).foreach { case (name, f) =>
      val entry = new ByteArrayOutputStream()
      writeStringField(entry, 1, name)                    // map entry key
      writeLenField(entry, 2, encodeFeature(f))           // map entry value
      writeLenField(fs, 1, entry.toByteArray)             // Features.feature
    }
    val out = new ByteArrayOutputStream()
    writeLenField(out, 1, fs.toByteArray)                 // Example.features
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  private def decodeBytesList(b: Array[Byte], off: Int, len: Int): BytesListF =
    BytesListF(fields(b, off, off + len).collect {
      case f if f.number == 1 && f.wireType == WtLen => f.slice(b)
    }.toVector)

  private def decodeFloatList(b: Array[Byte], off: Int, len: Int): FloatListF = {
    val out = Vector.newBuilder[Float]
    fields(b, off, off + len).foreach { f =>
      if (f.number == 1 && f.wireType == WtLen) {         // packed
        if (f.len % 4 != 0) throw new IllegalArgumentException(
          s"packed FloatList length ${f.len} not a multiple of 4")
        val bb = ByteBuffer.wrap(b, f.off, f.len).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < f.len / 4) { out += bb.getFloat; i += 1 }
      } else if (f.number == 1 && f.wireType == WtFixed32) // unpacked
        out += java.lang.Float.intBitsToFloat(f.varint.toInt)
    }
    FloatListF(out.result())
  }

  private def decodeInt64List(b: Array[Byte], off: Int, len: Int): Int64ListF = {
    val out = Vector.newBuilder[Long]
    fields(b, off, off + len).foreach { f =>
      if (f.number == 1 && f.wireType == WtLen) {         // packed
        var pos = f.off
        while (pos < f.off + f.len) {
          val (v, c) = readVarint(b, pos); out += v; pos += c
        }
      } else if (f.number == 1 && f.wireType == WtVarint) // unpacked
        out += f.varint
    }
    Int64ListF(out.result())
  }

  private def decodeFeature(b: Array[Byte], off: Int, len: Int): Option[TfFeature] = {
    // oneof: last occurrence wins (proto3 merge semantics for oneofs)
    var result: Option[TfFeature] = None
    fields(b, off, off + len).foreach { f =>
      if (f.wireType == WtLen) f.number match {
        case 1 => result = Some(decodeBytesList(b, f.off, f.len))
        case 2 => result = Some(decodeFloatList(b, f.off, f.len))
        case 3 => result = Some(decodeInt64List(b, f.off, f.len))
        case _ => () // unknown field: skip
      }
    }
    result
  }

  // --------------------------------------------------- SequenceExample

  /** tf.train.SequenceExample (public example.proto):
    * {{{
    * message SequenceExample { Features context = 1; FeatureLists feature_lists = 2; }
    * message FeatureLists { map<string, FeatureList> feature_list = 1; }
    * message FeatureList  { repeated Feature feature = 1; }
    * }}}
    * The sequence format for stepwise training data (audio frames, video
    * frames, token sequences): scalar/context features once, per-step
    * features as an ORDERED list of Feature messages. */
  def encodeSequence(context: Seq[(String, TfFeature)],
                     featureLists: Seq[(String, Seq[TfFeature])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    // context (field 1) reuses the Features encoding from encode()
    val ctx = {
      val fs = new ByteArrayOutputStream()
      context.sortBy(_._1).foreach { case (name, f) =>
        val entry = new ByteArrayOutputStream()
        writeStringField(entry, 1, name)
        writeLenField(entry, 2, encodeFeature(f))
        writeLenField(fs, 1, entry.toByteArray)
      }
      fs.toByteArray
    }
    writeLenField(out, 1, ctx)
    val fls = new ByteArrayOutputStream()
    featureLists.sortBy(_._1).foreach { case (name, steps) =>
      val fl = new ByteArrayOutputStream()
      steps.foreach(f => writeLenField(fl, 1, encodeFeature(f)))  // FeatureList.feature
      val entry = new ByteArrayOutputStream()
      writeStringField(entry, 1, name)
      writeLenField(entry, 2, fl.toByteArray)
      writeLenField(fls, 1, entry.toByteArray)                    // FeatureLists.feature_list
    }
    writeLenField(out, 2, fls.toByteArray)                        // SequenceExample.feature_lists
    out.toByteArray
  }

  /** Decode SequenceExample bytes → (context map, ordered feature lists). */
  def decodeSequence(bytes: Array[Byte])
      : (Map[String, TfFeature], Map[String, Vector[TfFeature]]) = {
    var ctx = Map.empty[String, TfFeature]
    var lists = Map.empty[String, Vector[TfFeature]]
    fields(bytes).foreach { top =>
      if (top.wireType == WtLen) top.number match {
        case 1 =>                                                // context Features
          fields(bytes, top.off, top.off + top.len).foreach { fe =>
            if (fe.number == 1 && fe.wireType == WtLen) {
              var key: String = null
              var value: Option[TfFeature] = None
              fields(bytes, fe.off, fe.off + fe.len).foreach { kv =>
                if (kv.number == 1 && kv.wireType == WtLen)
                  key = new String(bytes, kv.off, kv.len, UTF_8)
                else if (kv.number == 2 && kv.wireType == WtLen)
                  value = decodeFeature(bytes, kv.off, kv.len)
              }
              ctx += ((if (key == null) "" else key) ->
                value.getOrElse(BytesListF(Vector.empty)))
            }
          }
        case 2 =>                                                // feature_lists
          fields(bytes, top.off, top.off + top.len).foreach { fe =>
            if (fe.number == 1 && fe.wireType == WtLen) {
              var key: String = null
              val steps = Vector.newBuilder[TfFeature]
              fields(bytes, fe.off, fe.off + fe.len).foreach { kv =>
                if (kv.number == 1 && kv.wireType == WtLen)
                  key = new String(bytes, kv.off, kv.len, UTF_8)
                else if (kv.number == 2 && kv.wireType == WtLen)
                  fields(bytes, kv.off, kv.off + kv.len).foreach { st =>
                    if (st.number == 1 && st.wireType == WtLen)
                      steps += decodeFeature(bytes, st.off, st.len)
                        .getOrElse(BytesListF(Vector.empty))
                  }
              }
              lists += ((if (key == null) "" else key) -> steps.result())
            }
          }
        case _ => () // unknown field: skip
      }
    }
    (ctx, lists)
  }

  /** Decode Example bytes → feature map. Later duplicate map keys replace
    * earlier ones (proto3 map merge rule); unknown fields are skipped. */
  def decode(bytes: Array[Byte]): Map[String, TfFeature] = {
    var acc = Map.empty[String, TfFeature]
    fields(bytes).foreach { ex =>
      if (ex.number == 1 && ex.wireType == WtLen)          // Example.features
        fields(bytes, ex.off, ex.off + ex.len).foreach { fe =>
          if (fe.number == 1 && fe.wireType == WtLen) {    // Features.feature entry
            var key: String = null
            var value: Option[TfFeature] = None
            fields(bytes, fe.off, fe.off + fe.len).foreach { kv =>
              if (kv.number == 1 && kv.wireType == WtLen)
                key = new String(bytes, kv.off, kv.len, UTF_8)
              else if (kv.number == 2 && kv.wireType == WtLen)
                value = decodeFeature(bytes, kv.off, kv.len)
            }
            // absent key decodes as "" (proto3 default), absent value as
            // an unset Feature — both legal on the wire
            acc += ((if (key == null) "" else key) -> value.getOrElse(BytesListF(Vector.empty)))
          }
        }
    }
    acc
  }
}
