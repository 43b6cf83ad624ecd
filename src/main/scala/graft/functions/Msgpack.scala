package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal MessagePack codec — the reference gateway's wire format (G2,
  * `gateway.ts:189, 317`). Implemented from the public msgpack spec
  * (msgpack.org format description); covers the subset the gateway
  * exchanges: nil, bool, int (fixint/int8-64), double, str, bin, array,
  * map with string-ish keys.
  *
  * Values decode to: null, Boolean, Long, Double, String, Array[Byte],
  * Seq[Any], Map[Any, Any].
  */
object Msgpack {

  def encode(v: Any): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    write(out, v)
    out.flush()
    bos.toByteArray
  }

  private def write(out: DataOutputStream, v: Any): Unit = v match {
    case null => out.writeByte(0xc0)
    case b: Boolean => out.writeByte(if (b) 0xc3 else 0xc2)
    case i: Int => write(out, i.toLong)
    case l: Long =>
      if (l >= 0 && l <= 127) out.writeByte(l.toInt)
      else if (l < 0 && l >= -32) out.writeByte((0xe0 | (l + 32)).toInt)
      else if (l >= Byte.MinValue && l <= Byte.MaxValue) { out.writeByte(0xd0); out.writeByte(l.toInt) }
      else if (l >= Short.MinValue && l <= Short.MaxValue) { out.writeByte(0xd1); out.writeShort(l.toInt) }
      else if (l >= Int.MinValue && l <= Int.MaxValue) { out.writeByte(0xd2); out.writeInt(l.toInt) }
      else { out.writeByte(0xd3); out.writeLong(l) }
    case d: Double => out.writeByte(0xcb); out.writeDouble(d)
    case f: Float => write(out, f.toDouble)
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length <= 31) out.writeByte(0xa0 | b.length)
      else if (b.length <= 255) { out.writeByte(0xd9); out.writeByte(b.length) }
      else if (b.length <= 65535) { out.writeByte(0xda); out.writeShort(b.length) }
      else { out.writeByte(0xdb); out.writeInt(b.length) }
      out.write(b)
    case b: Array[Byte] =>
      if (b.length <= 255) { out.writeByte(0xc4); out.writeByte(b.length) }
      else if (b.length <= 65535) { out.writeByte(0xc5); out.writeShort(b.length) }
      else { out.writeByte(0xc6); out.writeInt(b.length) }
      out.write(b)
    case xs: Seq[_] =>
      if (xs.length <= 15) out.writeByte(0x90 | xs.length)
      else if (xs.length <= 65535) { out.writeByte(0xdc); out.writeShort(xs.length) }
      else { out.writeByte(0xdd); out.writeInt(xs.length) }
      xs.foreach(write(out, _))
    case m: Map[_, _] =>
      if (m.size <= 15) out.writeByte(0x80 | m.size)
      else if (m.size <= 65535) { out.writeByte(0xde); out.writeShort(m.size) }
      else { out.writeByte(0xdf); out.writeInt(m.size) }
      m.foreach { case (k, mv) => write(out, k); write(out, mv) }
    case other =>
      throw new IllegalArgumentException(s"unsupported msgpack type: ${other.getClass}")
  }

  def decode(bytes: Array[Byte]): Any = {
    val buf = ByteBuffer.wrap(bytes)
    val v = read(buf)
    require(!buf.hasRemaining, s"${buf.remaining()} trailing bytes after msgpack value")
    v
  }

  private def read(buf: ByteBuffer): Any = {
    val b = buf.get() & 0xff
    b match {
      case x if x <= 0x7f => x.toLong                       // positive fixint
      case x if x >= 0xe0 => (x - 256).toLong               // negative fixint
      case x if (x & 0xf0) == 0x80 => readMap(buf, x & 0x0f)
      case x if (x & 0xf0) == 0x90 => readArr(buf, x & 0x0f)
      case x if (x & 0xe0) == 0xa0 => readStr(buf, x & 0x1f)
      case 0xc0 => null
      case 0xc2 => false
      case 0xc3 => true
      case 0xc4 => readBin(buf, buf.get() & 0xff)
      case 0xc5 => readBin(buf, buf.getShort() & 0xffff)
      case 0xc6 => readBin(buf, buf.getInt())
      case 0xca => buf.getFloat().toDouble
      case 0xcb => buf.getDouble()
      case 0xcc => (buf.get() & 0xff).toLong
      case 0xcd => (buf.getShort() & 0xffff).toLong
      case 0xce => (buf.getInt() & 0xffffffffL)
      case 0xcf => buf.getLong()                            // uint64 (as signed)
      case 0xd0 => buf.get().toLong
      case 0xd1 => buf.getShort().toLong
      case 0xd2 => buf.getInt().toLong
      case 0xd3 => buf.getLong()
      case 0xd9 => readStr(buf, buf.get() & 0xff)
      case 0xda => readStr(buf, buf.getShort() & 0xffff)
      case 0xdb => readStr(buf, buf.getInt())
      case 0xdc => readArr(buf, buf.getShort() & 0xffff)
      case 0xdd => readArr(buf, buf.getInt())
      case 0xde => readMap(buf, buf.getShort() & 0xffff)
      case 0xdf => readMap(buf, buf.getInt())
      case other => throw new IllegalArgumentException(f"unsupported msgpack tag 0x$other%02x")
    }
  }

  private def readStr(buf: ByteBuffer, n: Int): String = {
    val b = new Array[Byte](n); buf.get(b); new String(b, StandardCharsets.UTF_8)
  }
  private def readBin(buf: ByteBuffer, n: Int): Array[Byte] = {
    val b = new Array[Byte](n); buf.get(b); b
  }
  // negative 32-bit lengths are malformed input and must ERROR (so the
  // envelope decoder nulls the row) — `0 until -1` is empty, which would
  // silently decode garbage as an empty collection instead
  private def readArr(buf: ByteBuffer, n: Int): Seq[Any] = {
    require(n >= 0, s"malformed msgpack: negative array length $n")
    (0 until n).map(_ => read(buf))
  }
  private def readMap(buf: ByteBuffer, n: Int): Map[Any, Any] = {
    require(n >= 0, s"malformed msgpack: negative map length $n")
    (0 until n).map(_ => (read(buf), read(buf))).toMap
  }
}
