package graft.core

/** Endian-aware primitive readers over byte arrays — shared by all format
  * parsers. Zero Spark dependencies (unit-testable alone, usable from both
  * driver-side planning and executor-side decoding).
  */
object Bin {
  @inline def u8(b: Array[Byte], off: Int): Int = b(off) & 0xff

  @inline def u16(b: Array[Byte], off: Int, little: Boolean): Int =
    if (little) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  @inline def i16(b: Array[Byte], off: Int, little: Boolean): Short =
    u16(b, off, little).toShort

  @inline def u32(b: Array[Byte], off: Int, little: Boolean): Long =
    i32(b, off, little) & 0xffffffffL

  @inline def i32(b: Array[Byte], off: Int, little: Boolean): Int =
    if (little)
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    else
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  @inline def i64(b: Array[Byte], off: Int, little: Boolean): Long =
    if (little)
      (i32(b, off, little) & 0xffffffffL) | (i32(b, off + 4, little).toLong << 32)
    else
      (i32(b, off, little).toLong << 32) | (i32(b, off + 4, little) & 0xffffffffL)

  @inline def f32bits(b: Array[Byte], off: Int, little: Boolean): Int =
    i32(b, off, little)

  @inline def f64bits(b: Array[Byte], off: Int, little: Boolean): Long =
    i64(b, off, little)

  /** NUL-terminated string from a fixed-width field. */
  def zstr(b: Array[Byte], off: Int, len: Int, cs: java.nio.charset.Charset): String = {
    var end = off
    val stop = off + len
    while (end < stop && b(end) != 0) end += 1
    new String(b, off, end - off, cs)
  }

  // --- little-endian writers (Stata 118 writes LSF) ---
  def putU16(o: java.io.OutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  def putU32(o: java.io.OutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
  def putU64(o: java.io.OutputStream, v: Long): Unit = {
    putU32(o, v & 0xffffffffL); putU32(o, (v >>> 32) & 0xffffffffL)
  }
  def putF64(o: java.io.OutputStream, v: Double): Unit =
    putU64(o, java.lang.Double.doubleToRawLongBits(v))
  def putF32(o: java.io.OutputStream, v: Float): Unit =
    putU32(o, java.lang.Float.floatToRawIntBits(v) & 0xffffffffL)

  /** Fixed-width space-padded ASCII field. */
  def putZPadSpace(o: java.io.OutputStream, s: String, width: Int): Unit = {
    val raw = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val n = math.min(raw.length, width)
    o.write(raw, 0, n)
    var i = n
    while (i < width) { o.write(' '); i += 1 }
  }

  /** Fixed-width NUL-padded field (truncating at byte boundary). */
  def putZPad(o: java.io.OutputStream, s: String, width: Int,
      cs: java.nio.charset.Charset): Unit = {
    val raw = s.getBytes(cs)
    val n = math.min(raw.length, width)
    o.write(raw, 0, n)
    var i = n
    while (i < width) { o.write(0); i += 1 }
  }
}
