package graft.core.sas

import java.io.RandomAccessFile
import java.nio.charset.{Charset, StandardCharsets}
import graft.core.Bin

/** SAS .sas7bdat data model + header/metadata-page parser + RLE/RDC
  * decompressors.
  *
  * Format facts follow the community sas7bdat specification (as also
  * implemented by ReadStat/pandas); behavioral reference: /root/reference
  * crates/polars_readstat_rs/src/sas/{header.rs, page.rs, metadata.rs,
  * data.rs, decompressor/}.
  */
object SasCore {

  val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  val EpochShiftDays = 3653
  val SecondsPerDay = 86400L

  // page types
  val PtMeta = 0; val PtData = 256; val PtMix1 = 512; val PtMix2 = 640
  val PtAmd = 1024; val PtMetc = 16384

  final case class SasColumn(name: String, format: String, label: String,
      isChar: Boolean, offset: Int, length: Int)

  final case class SasMeta(
      little: Boolean,
      bit64: Boolean,
      headerLength: Int,
      pageLength: Int,
      pageCount: Int,
      encodingByte: Int,
      sasRelease: String,
      compression: Int, // 0 none, 1 RLE, 2 RDC
      rowCount: Long,
      rowLength: Int,
      mixPageRowCount: Long,
      columns: Vector[SasColumn],
      firstDataPage: Int,
      mixDataRows: Long,
      datasetName: String = "",
      dateCreatedSas: Double = Double.NaN) { // seconds since 1960-01-01
    def charset: Charset = SasCore.charsetFor(encodingByte)
    def pageBitOffset: Int = if (bit64) 32 else 16
    def intSize: Int = if (bit64) 8 else 4
  }

  def charsetFor(byte: Int): Charset = {
    val name = byte match {
      case 20 => "UTF-8"
      case 28 => "US-ASCII"
      case 29 => "ISO-8859-1"
      case 30 => "ISO-8859-2"
      case 31 => "ISO-8859-3"
      case 32 => "ISO-8859-4"
      case 33 => "ISO-8859-5"
      case 34 => "ISO-8859-6"
      case 35 => "ISO-8859-7"
      case 36 => "ISO-8859-8"
      case 37 => "ISO-8859-9"
      case 40 => "ISO-8859-15"
      case 60 => "windows-1250"
      case 61 => "windows-1251"
      case 62 => "windows-1252"
      case 63 => "windows-1253"
      case 64 => "windows-1254"
      case 65 => "windows-1255"
      case 66 => "windows-1256"
      case 118 => "GBK"
      case 119 => "ISO-2022-JP"
      case 123 => "Big5"
      case 125 => "GB18030"
      case 134 => "EUC-JP"
      case 136 => "CP949"
      case 138 => "Shift_JIS"
      case 140 => "EUC-KR"
      case 167 => "Shift_JIS"
      case 205 => "GB18030"
      case 227 => "windows-1252"
      case _ => "windows-1252"
    }
    try Charset.forName(name)
    catch { case _: Exception => StandardCharsets.ISO_8859_1 }
  }

  // subheader signatures (4-byte, endian-normalized to u32)
  private val SigRowSize = 0xF7F7F7F7
  private val SigColSize = 0xF6F6F6F6
  private val SigColText = 0xFFFFFFFD
  private val SigColName = 0xFFFFFFFF
  private val SigColAttrs = 0xFFFFFFFC
  private val SigColFormat = 0xFFFFFBFE

  final case class PageSub(offset: Int, length: Int, compression: Int, typ: Int)

  def readPageHeader(page: Array[Byte], md: SasMeta): (Int, Int, Int) = {
    val o = md.pageBitOffset
    (Bin.u16(page, o, md.little), Bin.u16(page, o + 2, md.little),
      Bin.u16(page, o + 4, md.little))
  }

  def readSubheaders(page: Array[Byte], md: SasMeta, subheaderCount: Int): Seq[PageSub] = {
    val intS = md.intSize
    val shSize = 3 * intS
    (0 until subheaderCount).flatMap { i =>
      val off = md.pageBitOffset + 8 + i * shSize
      val subOff = readInt(page, off, md)
      val subLen = readInt(page, off + intS, md)
      val comp = page(off + intS * 2) & 0xff
      val typ = page(off + intS * 2 + 1) & 0xff
      if (subLen == 0 || comp == 1) None
      else Some(PageSub(subOff.toInt, subLen.toInt, comp, typ))
    }
  }

  @inline private def readInt(b: Array[Byte], off: Int, md: SasMeta): Long =
    if (md.bit64) Bin.i64(b, off, md.little) else Bin.u32(b, off, md.little)

  def isKnownMetadataSignature(b: Array[Byte], off: Int, len: Int): Boolean = {
    if (len < 4) return false
    def m4(o: Int, a: Int, x: Int, c: Int, d: Int) =
      (b(o) & 0xff) == a && (b(o + 1) & 0xff) == x && (b(o + 2) & 0xff) == c && (b(o + 3) & 0xff) == d
    val first =
      m4(off, 0xF7, 0xF7, 0xF7, 0xF7) || m4(off, 0xF6, 0xF6, 0xF6, 0xF6) ||
      m4(off, 0xFD, 0xFF, 0xFF, 0xFF) || m4(off, 0xFF, 0xFF, 0xFF, 0xFD) ||
      m4(off, 0xFF, 0xFF, 0xFF, 0xFF) || m4(off, 0xFC, 0xFF, 0xFF, 0xFF) ||
      m4(off, 0xFF, 0xFF, 0xFF, 0xFC) || m4(off, 0xFE, 0xFB, 0xFF, 0xFF) ||
      m4(off, 0xFF, 0xFF, 0xFB, 0xFE) || m4(off, 0xFE, 0xFF, 0xFF, 0xFF) ||
      m4(off, 0xFF, 0xFF, 0xFF, 0xFE) ||
      m4(off, 0x00, 0xFC, 0xFF, 0xFF) || m4(off, 0xFF, 0xFF, 0xFC, 0x00)
    if (first) return true
    if (len >= 8 && m4(off, 0x00, 0x00, 0x00, 0x00))
      m4(off + 4, 0xF7, 0xF7, 0xF7, 0xF7) || m4(off + 4, 0xF6, 0xF6, 0xF6, 0xF6) ||
      m4(off + 4, 0xFD, 0xFF, 0xFF, 0xFF) || m4(off + 4, 0xFC, 0xFF, 0xFF, 0xFF) ||
      m4(off + 4, 0xFE, 0xFB, 0xFF, 0xFF) || m4(off + 4, 0xFE, 0xFF, 0xFF, 0xFF)
    else false
  }

  /** Full metadata parse: header + one pass over all pages collecting
    * metadata subheaders (robust path; no fast-stop heuristics). */
  def parse(path: String): SasMeta = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val head0 = new Array[Byte](288)
      raf.readFully(head0)
      require(head0.slice(0, 32).sameElements(Magic), "not a sas7bdat file")
      val bit64 = head0(32) == '3'
      val little = head0(37) == 0x01
      val align1 = if (head0(35) == '3') 4 else 0
      val align2 = if (bit64) 4 else 0
      val headerLength = Bin.i32(head0, 196 + align1, little)
      // in-file lengths bound every allocation below; a corrupted header
      // must throw a clean error, not feed a multi-GB allocation
      require(headerLength >= 288 && headerLength <= raf.length(),
        s"corrupt sas7bdat: header length $headerLength outside [288, ${raf.length()}]")
      val head = new Array[Byte](headerLength)
      System.arraycopy(head0, 0, head, 0, math.min(288, headerLength))
      if (headerLength > 288) {
        raf.seek(288); raf.readFully(head, 288, headerLength - 288)
      }
      val pageLength = Bin.i32(head, 200 + align1, little)
      require(pageLength > 0 && pageLength <= raf.length(),
        s"corrupt sas7bdat: page length $pageLength outside (0, ${raf.length()}]")
      // the header's page count is unreliable (0 in some 64-bit BE files);
      // derive from file size like the reference's EOF-driven scan
      val pageCount = ((raf.length() - headerLength) / math.max(1, pageLength)).toInt
      val encodingByte = head(70) & 0xff
      val sasRelease = Bin.zstr(head, 216 + align1 + align2, 8, StandardCharsets.US_ASCII)
      // dataset name at 92 (64 bytes); creation timestamp f64 at 164+align1,
      // seconds since the SAS epoch (reference: src/sas/header.rs:107)
      val datasetName = Bin.zstr(head, 92, 64, StandardCharsets.US_ASCII).trim
      val dateCreatedSas =
        java.lang.Double.longBitsToDouble(Bin.i64(head, 164 + align1, little))

      // page scan
      var rowCount = -1L; var rowLength = -1; var mixRowCount = -1L
      var colCountP1 = -1L; var colCountP2 = -1L; var columnCount = -1
      var compression = 0
      val colTexts = Vector.newBuilder[Array[Byte]]
      var colTextsV = Vector.empty[Array[Byte]]
      final case class NameE(textIdx: Int, off: Int, len: Int)
      final case class AttrE(off: Int, len: Int, isChar: Boolean)
      final case class FmtE(fIdx: Int, fOff: Int, fLen: Int, lIdx: Int, lOff: Int, lLen: Int)
      var names = Vector.empty[NameE]
      var attrs = Vector.empty[AttrE]
      var fmts = Vector.empty[FmtE]
      var firstDataPage = -1
      var mixDataRows = 0L

      val pbo = if (bit64) 32 else 16
      val intS = if (bit64) 8 else 4
      val page = new Array[Byte](pageLength)
      var pageIdx = 0
      raf.seek(headerLength.toLong)
      var eof = false
      while (!eof && pageIdx < pageCount) {
        try raf.readFully(page)
        catch { case _: java.io.EOFException => eof = true }
        if (!eof) {
          val pType = Bin.u16(page, pbo, little)
          val subCount = Bin.u16(page, pbo + 4, little)
          val isMetaPage = pType == PtMeta || pType == PtMix1 || pType == PtMix2 ||
            pType == PtAmd || pType == PtMetc
          if (!isMetaPage) {
            if (firstDataPage < 0) firstDataPage = pageIdx
          } else {
            // walk subheaders
            val shSize = 3 * intS
            var i = 0
            while (i < subCount) {
              val off = pbo + 8 + i * shSize
              val subOff = (if (bit64) Bin.i64(page, off, little) else Bin.u32(page, off, little)).toInt
              val subLen = (if (bit64) Bin.i64(page, off + intS, little) else Bin.u32(page, off + intS, little)).toInt
              val comp = page(off + intS * 2) & 0xff
              if (subLen > 0 && comp == 0) {
                var sig = Bin.i32(page, subOff, little)
                if (bit64 && sig == 0xFFFFFFFF) sig = Bin.i32(page, subOff + 4, little)
                sig match {
                  case SigRowSize =>
                    rowLength = readInt(page, subOff + 5 * intS, bit64, little).toInt
                    rowCount = readInt(page, subOff + 6 * intS, bit64, little)
                    colCountP1 = readInt(page, subOff + 9 * intS, bit64, little)
                    colCountP2 = readInt(page, subOff + 10 * intS, bit64, little)
                    mixRowCount = readInt(page, subOff + 15 * intS, bit64, little)
                  case SigColSize =>
                    columnCount = readInt(page, subOff + intS, bit64, little).toInt
                  case SigColText =>
                    val textLen = subLen - intS
                    if (textLen > 0) {
                      val tb = java.util.Arrays.copyOfRange(page, subOff + intS, subOff + intS + textLen)
                      val s = new String(tb, StandardCharsets.ISO_8859_1)
                      if (s.contains("SASYZCRL")) compression = 1
                      else if (s.contains("SASYZCR2")) compression = 2
                      colTextsV :+= tb
                    }
                  case SigColName =>
                    val offMax = subOff + subLen - 12 - intS
                    var e = subOff + intS + 8
                    while (e <= offMax) {
                      names :+= NameE(Bin.u16(page, e, little), Bin.u16(page, e + 2, little),
                        Bin.u16(page, e + 4, little))
                      e += 8
                    }
                  case SigColAttrs =>
                    val offMax = subOff + subLen - 12 - intS
                    var e = subOff + intS + 8
                    while (e <= offMax) {
                      val cOff = readInt(page, e, bit64, little).toInt
                      val cLen = Bin.i32(page, e + intS, little)
                      val tb = page(e + intS + 6) & 0xff
                      attrs :+= AttrE(cOff, cLen, tb != 1)
                      e += intS + 8
                    }
                  case SigColFormat =>
                    val base = subOff + 3 * intS
                    fmts :+= FmtE(
                      Bin.u16(page, base + 22, little), Bin.u16(page, base + 24, little),
                      Bin.u16(page, base + 26, little), Bin.u16(page, base + 28, little),
                      Bin.u16(page, base + 30, little), Bin.u16(page, base + 32, little))
                  case _ =>
                }
              }
              i += 1
            }
            // compressed data subheaders make META pages data-bearing
            if (firstDataPage < 0 && compression != 0 &&
                pType != PtMix1 && pType != PtMix2 && rowLength > 0) {
              val subs = readSubheadersRaw(page, pbo, intS, subCount, bit64, little)
              if (subs.exists(s => (s.compression == 4 || s.compression == 0) &&
                  s.typ == 1 && s.length <= rowLength &&
                  !isKnownMetadataSignature(page, s.offset, math.min(8, pageLength - s.offset))))
                firstDataPage = pageIdx
            }
            // MIX pages carry data rows after the subheader table
            if ((pType == PtMix1 || pType == PtMix2) && rowLength > 0 && mixRowCount >= 0) {
              var dataStart = pbo + 8 + subCount * shSize
              if (dataStart % 8 == 4) dataStart += 4
              val maxFit = math.max(0, pageLength - dataStart) / rowLength
              mixDataRows += math.min(maxFit.toLong, mixRowCount)
            }
          }
          pageIdx += 1
        }
      }
      if (firstDataPage < 0) firstDataPage = math.max(0, pageIdx - 1)
      colTexts ++= colTextsV

      val cs = charsetFor(encodingByte)
      val nCols =
        if (columnCount >= 0) columnCount
        else if (colCountP1 >= 0 && colCountP2 >= 0) (colCountP1 + colCountP2).toInt
        else math.max(names.length, attrs.length)
      require(rowCount >= 0 && rowLength > 0, "missing SAS row-size metadata")
      // rows never span pages in sas7bdat, so a row length beyond the page
      // length is corruption — and it sizes per-row decompress buffers
      require(rowLength <= pageLength,
        s"corrupt sas7bdat: row length $rowLength exceeds page length $pageLength")

      def textAt(idx0: Int, off: Int, len: Int): String = {
        if (colTextsV.isEmpty || len == 0) return ""
        val idx = if (idx0 < colTextsV.length) idx0 else colTextsV.length - 1
        val tb = colTextsV(idx)
        val o = math.min(off, tb.length)
        val l = math.min(len, tb.length - o)
        if (l <= 0) return ""
        trimmedText(tb, o, l, cs)
      }

      val cols = (0 until nCols).map { i =>
        val n = names.lift(i).map(e => textAt(e.textIdx, e.off, e.len)).getOrElse(s"col_$i")
        val a = attrs.lift(i)
        val f = fmts.lift(i)
        SasColumn(
          name = if (n.isEmpty) s"col_${i + 1}" else n,
          format = f.map(e => textAt(e.fIdx, e.fOff, e.fLen)).getOrElse(""),
          label = f.map(e => textAt(e.lIdx, e.lOff, e.lLen)).getOrElse(""),
          isChar = a.exists(_.isChar),
          offset = a.map(_.off).getOrElse(0),
          length = a.map(_.len).getOrElse(0))
      }.toVector

      SasMeta(little, bit64, headerLength, pageLength, pageIdx, encodingByte,
        sasRelease, compression, rowCount, rowLength,
        if (mixRowCount >= 0) mixRowCount else rowCount, cols, firstDataPage,
        mixDataRows, datasetName, dateCreatedSas)
    } finally raf.close()
  }

  private def readSubheadersRaw(page: Array[Byte], pbo: Int, intS: Int,
      subCount: Int, bit64: Boolean, little: Boolean): Seq[PageSub] = {
    val shSize = 3 * intS
    (0 until subCount).flatMap { i =>
      val off = pbo + 8 + i * shSize
      val subOff = readInt(page, off, bit64, little).toInt
      val subLen = readInt(page, off + intS, bit64, little).toInt
      val comp = page(off + intS * 2) & 0xff
      val typ = page(off + intS * 2 + 1) & 0xff
      if (subLen == 0 || comp == 1) None
      else Some(PageSub(subOff, subLen, comp, typ))
    }
  }

  @inline private def readInt(b: Array[Byte], off: Int, bit64: Boolean, little: Boolean): Long =
    if (bit64) Bin.i64(b, off, little) else Bin.u32(b, off, little)

  // ---- decompressors ----

  /** RLE (SASYZCRL) — command nibble + count nibble scheme
    * (reference decompressor/rle.rs; constants from ReadStat). */
  object Rle {
    def decompress(input: Array[Byte], outLen: Int): Array[Byte] = {
      val out = new Array[Byte](outLen)
      var op = 0
      var ip = 0
      def copy(n: Int): Unit = {
        val c = math.min(n, math.min(outLen - op, input.length - ip))
        System.arraycopy(input, ip, out, op, c)
        ip += n; op += c
      }
      def fill(n: Int, b: Byte): Unit = {
        val c = math.min(n, outLen - op)
        java.util.Arrays.fill(out, op, op + c, b)
        op += c
      }
      while (ip < input.length && op < outLen) {
        val ctrl = input(ip) & 0xff; ip += 1
        val cmd = (ctrl >> 4) & 0x0F
        val nib = ctrl & 0x0F
        cmd match {
          case 0x00 => // COPY64
            if (ip >= input.length) { ip = input.length }
            else { val nb = input(ip) & 0xff; ip += 1; copy((nib << 8) + nb + 64) }
          case 0x01 => // COPY64+4096
            if (ip >= input.length) { ip = input.length }
            else { val nb = input(ip) & 0xff; ip += 1; copy(64 + nib * 256 + nb + 4096) }
          case 0x02 => copy(nib + 96)
          case 0x04 =>
            if (ip + 1 >= input.length) { ip = input.length }
            else {
              val nb = input(ip) & 0xff; val b = input(ip + 1); ip += 2
              fill((nib << 8) + nb + 18, b)
            }
          case 0x05 =>
            if (ip >= input.length) { ip = input.length }
            else { val nb = input(ip) & 0xff; ip += 1; fill((nib << 8) + nb + 17, 0x40) }
          case 0x06 =>
            if (ip >= input.length) { ip = input.length }
            else { val nb = input(ip) & 0xff; ip += 1; fill((nib << 8) + nb + 17, 0x20) }
          case 0x07 =>
            if (ip >= input.length) { ip = input.length }
            else { val nb = input(ip) & 0xff; ip += 1; fill((nib << 8) + nb + 17, 0x00) }
          case 0x08 => copy(nib + 1)
          case 0x09 => copy(nib + 17)
          case 0x0A => copy(nib + 33)
          case 0x0B => copy(nib + 49)
          case 0x0C =>
            if (ip >= input.length) { ip = input.length }
            else { val b = input(ip); ip += 1; fill(nib + 3, b) }
          case 0x0D => fill(nib + 2, 0x40)
          case 0x0E => fill(nib + 2, 0x20)
          case 0x0F => fill(nib + 2, 0x00)
          case other =>
            throw new IllegalArgumentException(s"invalid RLE command $other")
        }
      }
      out // tail already zero-filled
    }
  }

  /** RDC (SASYZCR2) — 16-bit control words, literals + RLE runs + history
    * pattern copies (reference decompressor/rdc.rs). */
  object Rdc {
    def decompress(input: Array[Byte], outLen: Int): Array[Byte] = {
      val out = new Array[Byte](outLen)
      var op = 0
      var ip = 0
      var ctrlBits = 0
      var ctrlMask = 0
      def patternCopy(offset: Int, count: Int): Unit = {
        require(op >= offset, s"RDC invalid offset $offset at $op")
        var i = 0
        val c = math.min(count, outLen - op)
        while (i < c) { out(op + i) = out(op - offset + i); i += 1 }
        op += c
      }
      while (ip < input.length && op < outLen) {
        if (ctrlMask == 0) {
          if (ip + 1 >= input.length) { ip = input.length }
          else {
            ctrlBits = ((input(ip) & 0xff) << 8) | (input(ip + 1) & 0xff)
            ip += 2
            ctrlMask = 0x8000
          }
        }
        if (ctrlMask != 0 && ip < input.length) {
          if ((ctrlBits & ctrlMask) == 0) {
            out(op) = input(ip); ip += 1; op += 1
          } else {
            val cb = input(ip) & 0xff; ip += 1
            val cmd = (cb >> 4) & 0x0F
            val cnt = cb & 0x0F
            cmd match {
              case 0 =>
                if (ip < input.length) {
                  val b = input(ip); ip += 1
                  val c = math.min(cnt + 3, outLen - op)
                  java.util.Arrays.fill(out, op, op + c, b); op += c
                } else ip = input.length
              case 1 =>
                if (ip + 1 < input.length) {
                  val extra = input(ip) & 0xff; val b = input(ip + 1); ip += 2
                  val c = math.min(cnt + (extra << 4) + 19, outLen - op)
                  java.util.Arrays.fill(out, op, op + c, b); op += c
                } else ip = input.length
              case 2 =>
                if (ip + 1 < input.length) {
                  val extra = input(ip) & 0xff; val countB = input(ip + 1) & 0xff; ip += 2
                  patternCopy(cnt + 3 + (extra << 4), countB + 16)
                } else ip = input.length
              case c if c >= 3 =>
                if (ip < input.length) {
                  val extra = input(ip) & 0xff; ip += 1
                  patternCopy(cnt + 3 + (extra << 4), c)
                } else ip = input.length
              case other =>
                throw new IllegalArgumentException(s"invalid RDC command $other")
            }
          }
          ctrlMask >>= 1
        }
      }
      out
    }
  }

  // ---- temporal format classification (constants.rs:23-39) ----
  private val DatetimeFormats = Array("DATETIME", "DTWKDATX", "B8601DN", "B8601DT",
    "B8601DX", "B8601DZ", "B8601LX", "E8601DN", "E8601DT", "E8601DX", "E8601DZ",
    "E8601LX", "DATEAMPM", "DTDATE", "DTMONYY", "DTYEAR", "TOD", "MDYAMPM")
  private val DateFormats = Array("DATE", "DAY", "DDMMYY", "JULDAY", "JULIAN",
    "MMDDYY", "MMYY", "MONNAME", "MONTH", "MONYY", "QTR", "QTRR", "NENGO",
    "WEEKDATE", "WEEKDATX", "WEEKDAY", "WEEKV", "WORDDATE", "WORDDATX", "YEAR",
    "YYMM", "YYMMDD", "YYMON", "YYQ", "YYQR")
  private val TimeFormats = Array("TIME", "HHMM")

  sealed trait Kind
  case object KNum extends Kind
  case object KChar extends Kind
  case object KDate extends Kind
  case object KDatetime extends Kind
  case object KTime extends Kind

  /** Trim ASCII space/control from both ends of a text slice, then decode.
    * Unsigned compares: bytes >= 0x80 (negative as signed JVM bytes —
    * multibyte/extended-encoding tails) are never stripped from
    * names/labels. */
  def trimmedText(tb: Array[Byte], o: Int, l: Int, cs: Charset): String = {
    var s = o; var e = o + l
    while (s < e && (tb(s) & 0xff) <= ' ') s += 1
    while (e > s && (tb(e - 1) & 0xff) <= ' ') e -= 1
    if (e <= s) "" else new String(tb, s, e - s, cs)
  }

  /** True when a numeric-format NAME would classify as temporal under the
    * same startsWith test kindFor (and ReadStat-family readers) apply.
    * Writers use it to avoid GENERATING catalog format names like YEARF
    * that would read a value-labeled numeric column back as a date. */
  def temporalPrefixed(name: String): Boolean = {
    val f = name.toUpperCase
    DatetimeFormats.exists(f.startsWith) || DateFormats.exists(f.startsWith) ||
      TimeFormats.exists(f.startsWith)
  }

  def kindFor(c: SasColumn): Kind = {
    if (c.isChar) return KChar
    val f = c.format.toUpperCase
    if (f.isEmpty) KNum
    else if (DatetimeFormats.exists(f.startsWith)) KDatetime // before DATE
    else if (DateFormats.exists(f.startsWith)) KDate
    else if (TimeFormats.exists(f.startsWith)) KTime
    else KNum
  }

  /** SAS date (days since 1960) → days since 1970, with ReadStat's
    * seconds-stored-as-date fallback for out-of-range values. */
  def toDateDays(v: Double): Int = {
    val days = v.toInt - EpochShiftDays
    if (days >= -135080 && days <= 156935) days
    else (v / SecondsPerDay).toInt - EpochShiftDays
  }

  def toDatetimeMicros(v: Double): Long =
    ((v - EpochShiftDays.toDouble * SecondsPerDay) * 1e6).toLong

  def toTimeNanos(v: Double): Long = (v * 1e9).toLong

  /** Reconstruct a truncated (3–7 byte) IEEE double (value.rs:58-91):
    * the stored bytes are the HIGH bytes of the 8-byte representation;
    * the dropped low mantissa bytes read back as zero. Assembled
    * directly into the long — this runs once per numeric CELL on
    * width-compressed files (the common real-survey layout), so a temp
    * buffer per call would be an allocation in the hottest loop. */
  def incompleteDouble(b: Array[Byte], off: Int, len: Int, little: Boolean): Double = {
    if (len >= 8) {
      java.lang.Double.longBitsToDouble(Bin.i64(b, off, little))
    } else {
      var bits = 0L
      var k = 0
      if (little) {
        while (k < len) {
          bits |= (b(off + k) & 0xffL) << (8 * (8 - len + k)); k += 1
        }
      } else {
        while (k < len) {
          bits |= (b(off + k) & 0xffL) << (8 * (7 - k)); k += 1
        }
      }
      java.lang.Double.longBitsToDouble(bits)
    }
  }
}
