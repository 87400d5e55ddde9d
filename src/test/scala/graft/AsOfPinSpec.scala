package graft

import graft.store.AsOfPin
import org.scalacheck.{Gen, Prop}

/** The logical pin's wire codec (round 13): `encoded` is the string
 *  the command API and run-pin manifests carry, so it must round-trip
 *  EVERY writer id and directory key the stores can produce —
 *  including URL-hostile ones (separators, '=', ':', '%', spaces,
 *  unicode paths) — and render canonically (sorted keys) so equal pins
 *  encode equal. */
class AsOfPinSpec extends SparkSpec {

  private val nastyString: Gen[String] = for {
    n <- Gen.choose(1, 24)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf(':', ';', '=', ',', '%', '/', ' ', '#', '\t', '日')))
  } yield cs.mkString

  private val pinGen: Gen[AsOfPin] = for {
    ledger <- Gen.mapOf(Gen.zip(nastyString, Gen.choose(-1L, 1L << 40)))
    seqs <- Gen.mapOf(Gen.zip(nastyString, Gen.choose(0L, 1L << 40)))
    millis <- Gen.choose(0L, Long.MaxValue / 2)
  } yield AsOfPin(ledger, seqs, millis)

  test("encode/decode round-trips arbitrary writer ids and dir keys") {
    checkProp(Prop.forAll(pinGen) { pin =>
      AsOfPin.decode(pin.encoded) == pin
    })
  }

  test("encoding is canonical: equal pins encode identically regardless " +
    "of map construction order") {
    val a = AsOfPin(Map("w1" -> 3L, "w2" -> 7L), Map("k" -> 1L), 5L)
    val b = AsOfPin(Map("w2" -> 7L, "w1" -> 3L), Map("k" -> 1L), 5L)
    assert(a.encoded == b.encoded)
    // single-line (embeddable in TSV manifests and JSON payloads)
    assert(!a.encoded.contains('\n') && !a.encoded.contains('\t'))
  }

  test("positions default to -1 (nothing committed) for unknown sequences") {
    val p = AsOfPin(Map.empty, Map.empty, 0L)
    assert(p.ledgerPos("never") == -1L && p.seqPos("never") == -1L)
    assert(AsOfPin.decode(p.encoded) == p)
  }

  test("malformed encodings are loud") {
    intercept[IllegalArgumentException] { AsOfPin.decode("not-a-pin") }
    intercept[IllegalArgumentException] { AsOfPin.decode("m=1;l=broken;s=") }
  }
}
