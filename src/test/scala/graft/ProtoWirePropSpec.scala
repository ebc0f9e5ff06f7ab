package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.coders.{ProtoWire, TfExample}
import graft.coders.TfExample._

/** Property tests for the hand-rolled proto wire codec: decode∘encode =
  * identity over arbitrary feature maps, and varint round-trips over the
  * full Long range. Drives ScalaCheck directly (no spark session needed). */
class ProtoWirePropSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  test("varint round-trip over arbitrary longs") {
    check("varint", Prop.forAll { (v: Long) =>
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeVarint(out, v)
      val (dec, n) = ProtoWire.readVarint(out.toByteArray, 0)
      dec == v && n == out.toByteArray.length
    })
  }

  test("zigzag round-trip over arbitrary longs") {
    check("zigzag", Prop.forAll { (v: Long) =>
      ProtoWire.unzigzag(ProtoWire.zigzag(v)) == v
    })
  }

  private val genFeature: Gen[TfFeature] = Gen.oneOf(
    Gen.listOf(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
      .map(l => BytesListF(l.toVector)),
    Gen.listOf(Gen.chooseNum(Float.MinValue, Float.MaxValue))
      .map(l => FloatListF(l.toVector)),
    Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .map(l => Int64ListF(l.toVector)))

  private val genFeatures: Gen[Map[String, TfFeature]] =
    Gen.mapOf(Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), genFeature))

  test("tf.Example decode∘encode = identity on arbitrary feature maps") {
    check("example-roundtrip", Prop.forAll(genFeatures) { fm =>
      val decoded = TfExample.decode(TfExample.encode(fm.toSeq))
      // byte arrays need deep comparison
      decoded.keySet == fm.keySet && fm.forall { case (k, f) =>
        (decoded(k), f) match {
          case (BytesListF(a), BytesListF(b)) =>
            a.length == b.length && a.zip(b).forall(p => p._1.sameElements(p._2) ||
              (p._1.isEmpty && p._2.isEmpty))
          case (x, y) => x == y
        }
      }
    })
  }

  test("encode is injective up to key order: different values → different bytes") {
    check("injective", Prop.forAll(genFeatures, genFeatures) { (a, b) =>
      val ea = TfExample.encode(a.toSeq).toSeq
      val eb = TfExample.encode(b.toSeq).toSeq
      // canonical encoding: equal maps ⇔ equal bytes (up to deep byte equality)
      val eqMaps = a.keySet == b.keySet && a.forall { case (k, f) =>
        (f, b(k)) match {
          case (BytesListF(x), BytesListF(y)) =>
            x.length == y.length && x.zip(y).forall(p => p._1.sameElements(p._2))
          case (x, y) => x == y
        }
      }
      (ea == eb) == eqMaps
    })
  }
}
