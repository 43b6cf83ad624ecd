package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, GZIPInputStream, GZIPOutputStream, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Binary codecs for the gateway compression pipeline (reference G14,
  * `gateway.ts:62-133`): zlib deflate/inflate and gzip over BinaryType.
  *
  * Plain Scala UDFs — per SURVEY.md §4.3 these are not perf-critical at
  * gateway payload sizes, and `java.util.zip` is the same zlib the
  * reference calls. Each function is deterministic for a fixed JVM (zlib
  * level 6 default), so results are stable across runs but are verified by
  * round-trip property tests rather than a SQL oracle.
  */
object Codecs {

  private def deflateBytes(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(b); d.finish()
    val out = new ByteArrayOutputStream(math.max(64, b.length / 2))
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflateBytes(b: Array[Byte]): Array[Byte] = {
    val i = new Inflater()
    i.setInput(b)
    val out = new ByteArrayOutputStream(math.max(64, b.length * 2))
    val buf = new Array[Byte](4096)
    while (!i.finished()) {
      val n = i.inflate(buf)
      // inflate()==0 can mean "stream just finished" — only a 0 with the
      // stream still unfinished is a truncation error
      if (n == 0 && !i.finished()) throw new java.util.zip.DataFormatException("truncated")
      out.write(buf, 0, n)
    }
    i.end()
    out.toByteArray
  }

  private def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(64, b.length / 2))
    val g = new GZIPOutputStream(out)
    g.write(b); g.close()
    out.toByteArray
  }

  private def gunzipBytes(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(b))
    val out = new ByteArrayOutputStream(math.max(64, b.length * 2))
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** True iff the payload starts with the zlib magic `0x78 0x9c`
    * (reference `gateway.ts:82`). */
  def isZlibDeflated(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && b(0) == 0x78.toByte && b(1) == 0x9c.toByte

  // NULL propagates as NULL, the builtin-function contract — Array[Byte]
  // is a reference type, so Spark hands the UDF a null for a NULL input
  // row and an unguarded codec would NPE the whole task
  private def nullSafe(f: Array[Byte] => Array[Byte]): Array[Byte] => Array[Byte] =
    b => if (b == null) null else f(b)

  val deflate: Column => Column = udf(nullSafe(deflateBytes)).apply(_)
  val inflate: Column => Column = udf(nullSafe(inflateBytes)).apply(_)
  val gzip: Column => Column = udf(nullSafe(gzipBytes)).apply(_)
  val gunzip: Column => Column = udf(nullSafe(gunzipBytes)).apply(_)
  val zlibMagic: Column => Column = udf(isZlibDeflated _).apply(_)

  // Direct byte-level API for tests / non-Spark callers.
  def deflateRaw(b: Array[Byte]): Array[Byte] = deflateBytes(b)
  def inflateRaw(b: Array[Byte]): Array[Byte] = inflateBytes(b)
  def gzipRaw(b: Array[Byte]): Array[Byte] = gzipBytes(b)
  def gunzipRaw(b: Array[Byte]): Array[Byte] = gunzipBytes(b)
}
