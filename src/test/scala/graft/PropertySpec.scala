package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import graft.functions.{Codecs, Msgpack}

/** Property-based checks (ScalaCheck) for the pure codec kernels — the
  * G2/G14 byte-level contracts that deterministic example specs can only
  * sample: msgpack encode/decode must roundtrip EVERY nested value, the
  * wire format must stay canonical at the fixint boundaries, and the
  * zlib cascade must roundtrip arbitrary payloads while always carrying
  * the magic byte the reference's content sniffing keys on
  * (gateway.ts:160-235 semantics).
  */
class PropertySpec extends AnyFunSuite {

  private def holds(p: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // generators produce values already in msgpack's CANONICAL decoded
  // forms (Long ints, finite Doubles, UTF-8-safe Strings, Array[Byte],
  // Seq, String-keyed Map) so roundtrip equality is well-defined
  private val safeString: Gen[String] = Gen.frequency(
    4 -> Gen.asciiPrintableStr,
    1 -> Gen.listOf(Gen.oneOf('å', 'ß', '語', '→', 'π')).map(_.mkString))
  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.const(null).map(x => x: Any),
    Arbitrary.arbitrary[Boolean].map(x => x: Any),
    Arbitrary.arbitrary[Long].map(x => x: Any),
    Gen.chooseNum(-1e9, 1e9).map(d => d: Any),
    safeString.map(x => x: Any),
    Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray: Any))
  private def valueGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      4 -> scalarGen,
      1 -> Gen.choose(0, 12).flatMap(n =>
        Gen.listOfN(n, valueGen(depth - 1))).map(xs => xs: Any),
      1 -> Gen.choose(0, 12).flatMap(n =>
        Gen.listOfN(n, Gen.zip(safeString, valueGen(depth - 1))))
        .map(_.toMap: Any))

  private def structEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.lazyZip(y).forall(structEq)
    case (x: Map[_, _], y: Map[_, _]) =>
      x.size == y.size && x.asInstanceOf[Map[Any, Any]].forall { case (k, v) =>
        y.asInstanceOf[Map[Any, Any]].get(k).exists(structEq(v, _)) }
    case (x, y) => x == y
  }

  test("msgpack: decode(encode(v)) roundtrips arbitrary nested values") {
    holds(Prop.forAll(valueGen(3)) { v =>
      structEq(Msgpack.decode(Msgpack.encode(v)), v) })
  }

  test("msgpack: every Long roundtrips exactly across the width ladder") {
    holds(Prop.forAll(Arbitrary.arbitrary[Long]) { l =>
      Msgpack.decode(Msgpack.encode(l)) == l })
  }

  test("msgpack: fixint range encodes in exactly one byte (canonical width)") {
    holds(Prop.forAll(Gen.choose(-32L, 127L)) { l =>
      Msgpack.encode(l).length == 1 })
  }

  test("msgpack: trailing garbage after a complete value is rejected") {
    holds(Prop.forAll(valueGen(1), Gen.nonEmptyListOf(Arbitrary.arbitrary[Byte])) {
      (v, extra) =>
        Prop.throws(classOf[IllegalArgumentException]) {
          Msgpack.decode(Msgpack.encode(v) ++ extra.toArray) } })
  }

  test("zlib: inflate(deflate(b)) == b and output always carries the 0x78 magic") {
    holds(Prop.forAll(Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray)) { b =>
      val z = Codecs.deflateRaw(b)
      (z(0) & 0xff) == 0x78 && Codecs.inflateRaw(z).sameElements(b) })
  }

  // The adaptive IVF cell count must agree with the oracle's SQL form
  // `1 << GREATEST(3, LEAST(12, LENGTH(BIN(GREATEST(1, n-1))) // 2))` at
  // EVERY corpus size, not just the driver-gate tier (n=500) — a
  // divergence at some other n would silently split the engines at that
  // scale. The SQL identity was swept against DuckDB across 5,086 n
  // values including every power-of-two boundary to 2^39 (zero
  // mismatches); this property pins the Scala side to the same
  // bit-length reference so a refactor cannot drift it.
  test("ivfKFor equals the bit-length reference form and clamps to [8, 4096]") {
    def reference(n: Long): Int = {
      val bl = java.lang.Long.toBinaryString(math.max(1L, n - 1)).length
      1 << math.max(3, math.min(12, bl / 2))
    }
    holds(Prop.forAll(Gen.chooseNum(0L, 1L << 50)) { n =>
      val k = operators.Similarity.ivfKFor(n)
      k == reference(n) && k >= 8 && k <= 4096 })
    // the sizes the corpus tiers actually exercise, pinned exactly
    assert(Seq(0L, 1L, 50L, 500L, 2000L, 20000L, 1000000000L)
      .map(operators.Similarity.ivfKFor) == Seq(8, 8, 8, 16, 32, 128, 4096))
  }

  test("ivfKFor is monotone non-decreasing in the corpus size") {
    holds(Prop.forAll(Gen.chooseNum(0L, (1L << 50) - 1), Gen.chooseNum(1L, 1000000L)) {
      (n, d) => operators.Similarity.ivfKFor(n) <= operators.Similarity.ivfKFor(n + d) })
  }
}
