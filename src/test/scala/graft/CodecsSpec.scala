package graft

import graft.functions.Codecs
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip properties for the G14 codec pipeline (gateway.ts:62-133). */
class CodecsSpec extends AnyFunSuite {

  private def randomPayloads: Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(42)
    (0 to 40).map { i =>
      val b = new Array[Byte](i * 100)
      rnd.nextBytes(b)
      b
    } :+ Array[Byte]() :+ ("spark " * 500).getBytes("UTF-8")
  }

  test("deflate/inflate round-trips arbitrary bytes") {
    randomPayloads.foreach { b =>
      assert(Codecs.inflateRaw(Codecs.deflateRaw(b)).sameElements(b))
    }
  }

  test("gzip/gunzip round-trips arbitrary bytes") {
    randomPayloads.foreach { b =>
      assert(Codecs.gunzipRaw(Codecs.gzipRaw(b)).sameElements(b))
    }
  }

  test("deflate output carries the zlib magic the reference sniffs (0x78 0x9c)") {
    val b = "the quick brown fox".getBytes("UTF-8")
    assert(Codecs.isZlibDeflated(Codecs.deflateRaw(b)))
    assert(!Codecs.isZlibDeflated(b))
    assert(!Codecs.isZlibDeflated(Array[Byte]()))
    assert(!Codecs.isZlibDeflated(null))
  }

  test("inflate of garbage fails rather than returning junk (reference 500 path)") {
    intercept[Exception](Codecs.inflateRaw(Array[Byte](1, 2, 3, 4)))
  }

  test("compression shrinks redundant payloads above the 1 KiB threshold") {
    val big = ("spark " * 400).getBytes("UTF-8") // 2400 B, highly redundant
    assert(big.length > 1024)
    assert(Codecs.deflateRaw(big).length < big.length / 4)
    assert(Codecs.gzipRaw(big).length < big.length / 4)
  }
}
