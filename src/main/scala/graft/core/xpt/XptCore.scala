package graft.core.xpt

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets

/** SAS transport (.xpt) v5/v8/v9 core: 80-byte records, 140-byte namestrs,
  * IBM/360 hex-float numerics. Public TS-140 spec; behavioral reference:
  * /root/reference crates/polars_readstat_rs/src/sas/xpt.rs.
  */
object XptCore {

  val Line = 80
  val NamestrSize = 140

  final case class XptColumn(name: String, label: String, format: String,
      isChar: Boolean, width: Int, offset: Int)

  final case class XptMeta(version: Int, tableName: String, fileLabel: String,
      columns: Vector[XptColumn], rowLength: Int, dataOffset: Long,
      rowCount: Long, created: String = "", modified: String = "",
      // non-padding bytes after the last whole row: the file was cut
      // mid-row. Recorded here (header still parses) so the MODULE can
      // throw loudly under failfast or salvage the whole-row prefix
      // under mode=permissive — same split as SasModule.truncationSuspect
      truncatedTail: Boolean = false)

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off + len
    while (end > off && (b(end - 1) == ' ' || b(end - 1) == 0)) end -= 1
    new String(b, off, end - off, StandardCharsets.ISO_8859_1)
  }

  def parse(path: String): XptMeta = {
    val raf = new RandomAccessFile(path, "r")
    try {
      def line(): Array[Byte] = { val b = new Array[Byte](Line); raf.readFully(b); b }
      val first = line()
      val name0 = str(first, 20, 8)
      val version =
        if (name0.startsWith("LIBRARY")) 5
        else if (name0.startsWith("LIBV8")) 8
        else throw new IllegalArgumentException(s"not an XPT file (got $name0)")
      // SAS library record (created ddMMMyy:hh:mm:ss at 64..80) + timestamp
      // record (modified at 0..16)
      val libRec = line(); val tsRec = line()
      val created = str(libRec, 64, 16)
      val modified = str(tsRec, 0, 16)
      line()         // MEMBER/MEMBV8
      line()         // DSCRPTR/DSCPTV8
      val memberRec = line()
      val tableName = if (version >= 8) str(memberRec, 8, 32) else str(memberRec, 8, 8)
      val labelRec = line()
      val fileLabel = str(labelRec, 32, 40)
      val nsHeader = line()
      val varCount = str(nsHeader, 53, 5).trim.toInt
      val nsBytes = varCount * NamestrSize
      val nsPadded = (nsBytes + Line - 1) / Line * Line
      val ns = new Array[Byte](nsPadded)
      raf.readFully(ns)

      def u16(o: Int): Int = ((ns(o) & 0xff) << 8) | (ns(o + 1) & 0xff)
      var cols = (0 until varCount).map { i =>
        val base = i * NamestrSize
        val ntype = u16(base)
        val width = u16(base + 4)
        val nm =
          if (version >= 8) str(ns, base + 88, 32)
          else str(ns, base + 8, 8)
        val label = str(ns, base + 16, 40)
        val fmtName = str(ns, base + 56, 8)
        val nfl = u16(base + 64); val nfd = u16(base + 66)
        val fmt =
          if (fmtName.isEmpty) ""
          else if (nfl > 0 && nfd > 0) s"$fmtName$nfl.$nfd"
          else if (nfl > 0) s"$fmtName$nfl"
          else fmtName
        XptColumn(nm, label, fmt, isChar = ntype == 2, width = width, offset = 0)
      }.toVector

      // v8: optional LABELV8/LABELV9 sections before OBSV8
      val obsRec = line()
      if (version >= 8) {
        val n = str(obsRec, 20, 8)
        if (n.startsWith("LABELV8") || n.startsWith("LABELV9")) {
          val v9 = n.startsWith("LABELV9")
          val count = str(obsRec, 48, 5).trim.toInt
          var i = 0
          val updated = cols.toArray
          while (i < count) {
            val hdr = new Array[Byte](if (v9) 10 else 6)
            raf.readFully(hdr)
            def h16(o: Int) = ((hdr(o) & 0xff) << 8) | (hdr(o + 1) & 0xff)
            val idx = h16(0); val nameLen = h16(2); val labelLen = h16(4)
            val fmtLen = if (v9) h16(6) else 0
            val infLen = if (v9) h16(8) else 0
            val payload = new Array[Byte](nameLen + labelLen + fmtLen + infLen)
            raf.readFully(payload)
            if (idx > 0 && idx <= updated.length) {
              val c = updated(idx - 1)
              val nn = if (nameLen > 0) str(payload, 0, nameLen) else c.name
              val nl = if (labelLen > 0) str(payload, nameLen, labelLen) else c.label
              val nf = if (fmtLen > 0) str(payload, nameLen + labelLen, fmtLen) else c.format
              updated(idx - 1) = c.copy(name = nn, label = nl, format = nf)
            }
            i += 1
          }
          cols = updated.toVector
          // align to record boundary, then consume OBSV8
          val rem = (raf.getFilePointer % Line).toInt
          if (rem != 0) raf.seek(raf.getFilePointer + (Line - rem))
          line()
        }
      }

      var off = 0
      cols = cols.map { c => val r = c.copy(offset = off); off += c.width; r }
      val rowLength = off
      val dataOffset = raf.getFilePointer
      val rowCount =
        if (rowLength == 0) 0L
        else (raf.length() - dataOffset) / rowLength
      // The format has no row-count field — rows run to EOF — so a file
      // truncated mid-row would otherwise silently floor to fewer rows
      // (data loss at ingest). A valid transport file only ever has
      // blank/NUL padding after its last whole row; anything else is a
      // cut-off row. (Truncation at an exact row boundary is
      // indistinguishable from a valid EOF by design of the format.)
      var truncatedTail = false
      if (rowLength != 0 && (raf.length() - dataOffset) % rowLength != 0) {
        val rem = ((raf.length() - dataOffset) % rowLength).toInt
        raf.seek(dataOffset + rowCount * rowLength)
        val tail = new Array[Byte](rem)
        raf.readFully(tail)
        truncatedTail = !tail.forall(b => b == 0x20 || b == 0x00)
      }
      XptMeta(version, tableName, fileLabel, cols, rowLength, dataOffset,
        rowCount, created, modified, truncatedTail)
    } finally raf.close()
  }

  /** Missing: payload bytes all zero and first byte '.' / 'A'-'Z' / '_'. */
  def isMissing(b: Array[Byte], off: Int, len: Int): Boolean = {
    var i = off + 1
    while (i < off + len) { if (b(i) != 0) return false; i += 1 }
    val c = b(off)
    c == '.' || (c >= 'A' && c <= 'Z') || c == '_'
  }

  /** IBM/360 hex float (big-endian) → IEEE double (xpt.rs:410-466). */
  def ibmToDouble(b: Array[Byte], off: Int, len: Int): Double = {
    val p = new Array[Byte](8)
    System.arraycopy(b, off, p, 0, math.min(len, 8))
    val sign = (p(0) & 0x80) >>> 7
    val ibmExp = p(0) & 0x7f
    var mantissa = 0L
    var i = 1
    while (i < 8) { mantissa = (mantissa << 8) | (p(i) & 0xffL); i += 1 }
    if (mantissa == 0) return if (sign != 0) -0.0 else 0.0
    val k = 63 - java.lang.Long.numberOfLeadingZeros(mantissa)
    val ieeeExp = k + 4 * ibmExp + 711
    if (ieeeExp <= 0) return if (sign != 0) -0.0 else 0.0
    if (ieeeExp >= 2047) return if (sign != 0) Double.NegativeInfinity else Double.PositiveInfinity
    val fracBits = mantissa ^ (1L << k)
    val fraction =
      (if (k >= 52) fracBits >>> (k - 52) else fracBits << (52 - k)) & 0x000FFFFFFFFFFFFFL
    java.lang.Double.longBitsToDouble((sign.toLong << 63) | (ieeeExp.toLong << 52) | fraction)
  }

  /** IEEE double → IBM hex float bytes (inverse; xpt_writer.rs:33-70). */
  /** Allocation-free variant of [[doubleToIbm]]: encodes into `out` at
    * `off` (8 bytes). Used by the xpt writer's per-row encode loop. */
  def doubleToIbmInto(value: Double, out: Array[Byte], off: Int): Unit = {
    java.util.Arrays.fill(out, off, off + 8, 0.toByte)
    if (value.isNaN || value.isInfinite) { out(off) = '.'; return }
    if (value == 0.0) return
    val bits = java.lang.Double.doubleToRawLongBits(value)
    val sign = (bits >>> 63).toInt
    val ieeeExp = ((bits >>> 52) & 0x7FF).toInt
    val ieeeFrac = bits & 0x000FFFFFFFFFFFFFL
    if (ieeeExp == 0) return // subnormal → zero
    val s = (1L << 52) | ieeeFrac
    val adj = java.lang.Math.floorMod(ieeeExp - 763, 4)
    val ibmExp = (ieeeExp - 763 - adj) / 4
    if (ibmExp < 0 || ibmExp > 127) { out(off) = '.'; return }
    val mantissa = s << adj
    out(off) = (((sign << 7) | ibmExp) & 0xff).toByte
    out(off + 1) = ((mantissa >>> 48) & 0xff).toByte
    out(off + 2) = ((mantissa >>> 40) & 0xff).toByte
    out(off + 3) = ((mantissa >>> 32) & 0xff).toByte
    out(off + 4) = ((mantissa >>> 24) & 0xff).toByte
    out(off + 5) = ((mantissa >>> 16) & 0xff).toByte
    out(off + 6) = ((mantissa >>> 8) & 0xff).toByte
    out(off + 7) = (mantissa & 0xff).toByte
  }

  def doubleToIbm(value: Double): Array[Byte] = {
    if (value.isNaN || value.isInfinite) return Array[Byte]('.', 0, 0, 0, 0, 0, 0, 0)
    if (value == 0.0) return new Array[Byte](8)
    val bits = java.lang.Double.doubleToRawLongBits(value)
    val sign = (bits >>> 63).toInt
    val ieeeExp = ((bits >>> 52) & 0x7FF).toInt
    val ieeeFrac = bits & 0x000FFFFFFFFFFFFFL
    if (ieeeExp == 0) return new Array[Byte](8) // subnormal → zero
    val s = (1L << 52) | ieeeFrac
    val adj = java.lang.Math.floorMod(ieeeExp - 763, 4)
    val ibmExp = (ieeeExp - 763 - adj) / 4
    if (ibmExp < 0 || ibmExp > 127) return Array[Byte]('.', 0, 0, 0, 0, 0, 0, 0)
    val mantissa = s << adj
    Array(
      (((sign << 7) | ibmExp) & 0xff).toByte,
      ((mantissa >>> 48) & 0xff).toByte, ((mantissa >>> 40) & 0xff).toByte,
      ((mantissa >>> 32) & 0xff).toByte, ((mantissa >>> 24) & 0xff).toByte,
      ((mantissa >>> 16) & 0xff).toByte, ((mantissa >>> 8) & 0xff).toByte,
      (mantissa & 0xff).toByte)
  }
}
