package graft.spark.readstat.writers

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets

/** .sas7bcat format-catalog WRITER — the companion to the binary
  * sas7bdat writer (the reference ships neither; SAS stores value labels
  * in catalogs, not in the data file, so a complete label roundtrip
  * needs both). Layout is the inverse of [[graft.core.sas.SasCatalog]]
  * (which follows ReadStat's public sas7bcat algorithm): a header page,
  * an XLSR index page whose entries point at chain blocks, and one block
  * per format holding its value/label table.
  *
  * Emitted shape: 64-bit little-endian, UTF-8, one format block per
  * page (no chains — a block is capped at one page and the writer
  * refuses louder-than-life label tables instead of silently splitting).
  */
object SasCatalogWriter {

  private val HeaderLen = 1024
  private val PageLen = 64 * 1024
  private val BlockPos = 16 // block offset inside its page (any > 0 works)
  private val ChainHdrLen = 32 // u64 chain header
  private val PayloadOff = 138 // 106 + 32 (u64)

  // reader geometry (SasCatalog.scala): u64 + align1=4
  private val XlsrSize = 212 + 4 + 72
  private val XlsrOffset = 856 + 2 * 4 + 144
  private val XlsrOOffset = 50 + 4 + 24

  private val CatalogMagic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x63,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  /** Format names: ≤ 8 bytes incl. a leading '$' for string formats (the
    * short-name slot; long-name blocks are a read-side-only feature),
    * uppercase, not ending in a digit — SAS's own naming rules. */
  def write(path: String,
      numeric: Map[String, Map[Double, String]],
      string: Map[String, Map[String, String]]): Unit = {
    (numeric.keySet ++ string.keySet).foreach { n =>
      require(n.nonEmpty && n.length <= 8 && !n.last.isDigit &&
        n.forall(c => c == '$' || c == '_' || c.isLetterOrDigit) &&
        !n.tail.contains('$'),
        s"sas7bcat writer: format name '$n' must be ≤8 chars of " +
          "[A-Za-z0-9_] (leading '$' for string formats), not digit-final")
    }
    string.keys.foreach(n => require(n.startsWith("$"),
      s"sas7bcat writer: string format '$n' must start with '$$'"))
    numeric.keys.foreach(n => require(!n.startsWith("$"),
      s"sas7bcat writer: numeric format '$n' must not start with '$$'"))
    string.values.flatten.foreach { case (code, _) =>
      require(code.getBytes(StandardCharsets.UTF_8).length <= 16,
        s"sas7bcat writer: string code '$code' exceeds the 16-byte key slot")
    }

    val blocks: Seq[(String, Array[Byte])] =
      numeric.toSeq.sortBy(_._1).map { case (n, m) =>
        n -> buildBlock(n, m.toSeq.sortBy(_._1).map { case (v, l) =>
          (Left(v): Either[Double, String], l) })
      } ++ string.toSeq.sortBy(_._1).map { case (n, m) =>
        n -> buildBlock(n, m.toSeq.sortBy(_._1).map { case (s, l) =>
          (Right(s): Either[Double, String], l) })
      }
    blocks.foreach { case (n, b) =>
      require(ChainHdrLen + b.length <= PageLen - BlockPos,
        s"sas7bcat writer: format '$n' label table (${b.length}B) exceeds " +
          s"one $PageLen-byte page")
    }
    require(blocks.length * XlsrSize + XlsrOffset <= PageLen,
      s"sas7bcat writer: ${blocks.length} formats exceed one index page " +
        s"(max ${(PageLen - XlsrOffset) / XlsrSize})")

    // pages: [0] filler, [1] XLSR index, [2..] one block page per format;
    // XLSR pageNum is 1-based over data pages (reader seeks pageNum-1)
    val pageCount = 2 + blocks.length
    AtomicFile.write(path) { tmp =>
      val os = new BufferedOutputStream(new FileOutputStream(tmp), 1 << 20)
      // header
      val h = new Array[Byte](HeaderLen)
      System.arraycopy(CatalogMagic, 0, h, 0, 32)
      h(32) = '3'; h(35) = '3'; h(37) = 0x01; h(39) = '1'
      h(70) = 20 // UTF-8
      putAscii(h, 84, "SAS FILE", 8)
      putAscii(h, 92, "FORMATS", 64)
      putAscii(h, 156, "CATALOG", 8)
      putI32(h, 200, HeaderLen)
      putI32(h, 204, PageLen)
      putI32(h, 208, pageCount)
      putAscii(h, 224, "9.0401M7", 8)
      os.write(h)
      // page 0: filler
      os.write(new Array[Byte](PageLen))
      // page 1: XLSR index
      val idx = new Array[Byte](PageLen)
      blocks.indices.foreach { i =>
        val off = XlsrOffset + i * XlsrSize
        idx(off) = 'X'; idx(off + 1) = 'L'; idx(off + 2) = 'S'; idx(off + 3) = 'R'
        putI64(idx, off + 8, i + 3L) // 1-based page number of the block page
        putU16(idx, off + 16, BlockPos)
        idx(off + XlsrOOffset) = 'O'
      }
      os.write(idx)
      // block pages
      blocks.foreach { case (_, b) =>
        val pg = new Array[Byte](PageLen)
        // chain header: no next link, this block is whole
        putU16(pg, BlockPos + 8, 0)        // next pos
        putU16(pg, BlockPos + 10, b.length) // payload length
        System.arraycopy(b, 0, pg, BlockPos + ChainHdrLen, b.length)
        os.write(pg)
      }
      os.close()
    }
  }

  /** One format's block: header (flags, short name, cap/used counts) +
    * payload of `cap` value entries then `used` label entries. */
  private def buildBlock(name: String,
      labels: Seq[(Either[Double, String], String)]): Array[Byte] = {
    val n = labels.length
    val isString = name.startsWith("$")
    val valueEntryLen = if (isString) 36 else 30
    val payload = new java.io.ByteArrayOutputStream()
    // value entries: labelPos i32 at +14 (file align1=4); numeric key =
    // negated BIG-endian double at +22; string key = last 16 bytes
    labels.zipWithIndex.foreach { case ((key, _), i) =>
      val e = new Array[Byte](valueEntryLen)
      putU16(e, 2, valueEntryLen - 6)
      putI32(e, 14, i)
      key match {
        case Left(v) =>
          val bits = java.lang.Double.doubleToLongBits(-v)
          var j = 0
          while (j < 8) { e(22 + j) = ((bits >> (56 - 8 * j)) & 0xff).toByte; j += 1 }
        case Right(s) =>
          val sb = s.getBytes(StandardCharsets.UTF_8)
          java.util.Arrays.fill(e, 20, 36, ' '.toByte)
          System.arraycopy(sb, 0, e, 20, sb.length)
      }
      payload.write(e)
    }
    // label entries: u16 length at +8, text at +10, stride 10+len+1
    labels.foreach { case (_, l) =>
      val lb = l.getBytes(StandardCharsets.UTF_8)
      require(lb.length <= 0xFFFF, s"sas7bcat writer: label too long: ${l.take(40)}…")
      val e = new Array[Byte](10 + lb.length + 1)
      putU16(e, 8, lb.length)
      System.arraycopy(lb, 0, e, 10, lb.length)
      payload.write(e)
    }
    val out = new Array[Byte](PayloadOff + payload.size())
    // flags = 0: no local pad, no long-name extension
    putAscii(out, 8, name, 8)
    putI64(out, 42, n) // cap
    putI64(out, 50, n) // used
    System.arraycopy(payload.toByteArray, 0, out, PayloadOff, payload.size())
    out
  }

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    var i = 0; var x = v
    while (i < 4) { b(off + i) = (x & 0xff).toByte; x >>= 8; i += 1 }
  }
  private def putI64(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0; var x = v
    while (i < 8) { b(off + i) = (x & 0xff).toByte; x >>= 8; i += 1 }
  }
  private def putAscii(b: Array[Byte], off: Int, s: String, len: Int): Unit = {
    val sb = s.getBytes(StandardCharsets.US_ASCII)
    var i = 0
    while (i < len) { b(off + i) = if (i < sb.length) sb(i) else ' '; i += 1 }
  }
}
