package graft.core.stata

import java.io.RandomAccessFile
import graft.core.Bin
import StataTypes._

/** Driver-side .dta header/metadata parser for dta versions 102–119
  * (xmlish 117+ and legacy binary layouts). Behavioral reference:
  * /root/reference crates/polars_readstat_rs/src/stata/{header.rs,
  * metadata.rs, data.rs:874-977}; layout constants follow the public
  * dta specification.
  */
object StataParser {

  private val XmlTag = "<stata_dta>".getBytes("ascii")

  final case class Layout(
      xmlish: Boolean,
      typlistVersion: Int,   // 0 | 111 | 117
      typlistEntryLen: Int,
      varNameLen: Int,
      fmtLen: Int,
      lblNameLen: Int,
      varLabelLen: Int,
      dataLabelLen: Int,
      dataLabelLenLen: Int,
      timestampLen: Int,
      srtEntryLen: Int,
      expansionLenLen: Int,
      vlLenLen: Int,
      vlLabnameLen: Int,
      vlPaddingLen: Int)

  def layoutFor(version: Int): Layout = {
    require(version >= 102 && version <= 119, s"unsupported Stata version: $version")
    val fmtLen =
      if (version < 105) 7 else if (version < 114) 12
      else if (version < 118) 49 else 57
    val typlistVersion =
      if (version >= 117) 117 else if (version >= 111) 111 else 0
    val (dataLabelLenLen, timestampLen) =
      if (version >= 118) (2, 18)
      else if (version >= 117) (1, 18)
      else (0, if (version < 105) 0 else 18)
    val (lblNameLen, varNameLen) =
      if (version < 110) (9, 9) else if (version < 118) (33, 33) else (129, 129)
    val (varLabelLen, dataLabelLen) =
      if (version < 108) (32, 32) else if (version < 118) (81, 81) else (321, 321)
    val typlistEntryLen = if (version < 117) 1 else 2
    val srtEntryLen = if (version < 119) 2 else 4
    val expansionLenLen =
      if (version < 105) 0 else if (version < 110) 2 else 4
    val (vlLenLen, vlLabnameLen, vlPaddingLen) =
      if (version < 105) (2, 12, 2)
      else (4, if (version < 118) 33 else 129, 3)
    Layout(version >= 117, typlistVersion, typlistEntryLen, varNameLen, fmtLen,
      lblNameLen, varLabelLen, dataLabelLen, dataLabelLenLen, timestampLen,
      srtEntryLen, expansionLenLen, vlLenLen, vlLabnameLen, vlPaddingLen)
  }

  /** Sequential cursor over a RandomAccessFile. */
  private final class Cur(raf: RandomAccessFile) {
    def pos: Long = raf.getFilePointer
    def seek(p: Long): Unit = raf.seek(p)
    // every variable-length field in the format (strL GSOs, labels,
    // expansion blocks) sizes an allocation from in-file bytes; a
    // corrupted length must throw cleanly, never allocate gigabytes
    private def checkLen(n: Int): Unit =
      require(n >= 0 && n <= raf.length() - raf.getFilePointer,
        s"corrupt dta: field of $n bytes exceeds the " +
          s"${raf.length() - raf.getFilePointer} remaining in the file")
    def bytes(n: Int): Array[Byte] = {
      checkLen(n)
      val b = new Array[Byte](n); raf.readFully(b); b
    }
    def bytesOrNone(n: Int): Option[Array[Byte]] = {
      // probe read: callers pass constant sizes and treat "not enough
      // bytes left" as EOF (the pre-117 label loop), so answer None
      // rather than the corrupt-length error
      if (n < 0 || n > raf.length() - raf.getFilePointer) return None
      val b = new Array[Byte](n)
      var got = 0
      while (got < n) {
        val r = raf.read(b, got, n - got)
        if (r < 0) return if (got == 0) None else None
        got += r
      }
      Some(b)
    }
    def u8(): Int = raf.readUnsignedByte()
    def u16(le: Boolean): Int = Bin.u16(bytes(2), 0, le)
    def u32(le: Boolean): Long = Bin.u32(bytes(4), 0, le)
    def i32(le: Boolean): Int = Bin.i32(bytes(4), 0, le)
    def u64(le: Boolean): Long = Bin.i64(bytes(8), 0, le)
    def expectTag(tag: String): Unit = {
      val b = bytes(tag.length)
      require(b.sameElements(tag.getBytes("ascii")),
        s"expected $tag at ${pos - tag.length}, got '${new String(b, "ascii")}'")
    }
    def tryTag(tag: String): Boolean = {
      val p = pos
      bytesOrNone(tag.length) match {
        case Some(b) if b.sameElements(tag.getBytes("ascii")) => true
        case _ => seek(p); false
      }
    }
  }

  def parse(path: String): Metadata = {
    val raf = new RandomAccessFile(path, "r")
    try parse(new Cur(raf))
    finally raf.close()
  }

  private def parse(c: Cur): Metadata = {
    val probe = c.bytes(XmlTag.length)
    val xmlish = probe.sameElements(XmlTag)
    if (!xmlish) c.seek(0)

    // ---- header ----
    var version = 0; var little = true; var nVars = 0; var nObs = 0L
    if (xmlish) {
      c.expectTag("<header>")
      c.expectTag("<release>")
      version = new String(c.bytes(3), "ascii").toInt
      c.expectTag("</release>")
      c.expectTag("<byteorder>")
      val bo = new String(c.bytes(3), "ascii")
      little = bo == "LSF"
      c.expectTag("</byteorder>")
      c.expectTag("<K>")
      nVars = if (version >= 119) c.u32(little).toInt else c.u16(little)
      c.expectTag("</K>")
      c.expectTag("<N>")
      nObs = if (version >= 118) c.u64(little) else c.u32(little)
      c.expectTag("</N>")
    } else {
      version = c.u8()
      val byteorder = c.u8()
      c.u8(); c.u8() // filetype, unused
      little = byteorder != 0x01
      nVars = c.u16(little)
      nObs = if (version == 102) c.u16(little).toLong else c.u32(little)
    }
    val layout = layoutFor(version)
    val cs = charsetFor(version)

    // ---- data label + timestamp ----
    var dataLabel: Option[String] = None
    var timestamp: Option[String] = None
    val labelLen =
      if (layout.xmlish) {
        c.expectTag("<label>")
        if (layout.dataLabelLenLen == 2) c.u16(little)
        else c.u8()
      } else layout.dataLabelLen
    if (labelLen > 0) {
      val b = c.bytes(labelLen)
      val s = Bin.zstr(b, 0, b.length, cs)
      if (s.nonEmpty) dataLabel = Some(s)
    }
    if (layout.xmlish) { c.expectTag("</label>"); c.expectTag("<timestamp>") }
    val tsLen = if (layout.xmlish) c.u8() else layout.timestampLen
    if (tsLen > 0) {
      val b = c.bytes(tsLen)
      val s = Bin.zstr(b, 0, b.length, cs)
      if (s.nonEmpty) timestamp = Some(s)
    }
    if (layout.xmlish) { c.expectTag("</timestamp>"); c.expectTag("</header>") }

    // ---- map (xmlish only) ----
    var dataOffset = 0L; var strlsOffset = 0L; var vlOffset = 0L
    if (layout.xmlish) {
      c.expectTag("<map>")
      val m = Array.fill(14)(c.u64(little))
      c.expectTag("</map>")
      dataOffset = m(9); strlsOffset = m(10); vlOffset = m(11)
    }

    // ---- typlist / varnames / sortlist / formats / lblnames / varlabels ----
    def chunk(n: Int, startTag: String, endTag: String): Array[Byte] = {
      if (layout.xmlish) c.expectTag(startTag)
      val b = c.bytes(n)
      if (layout.xmlish) c.expectTag(endTag)
      b
    }
    val typBuf = chunk(nVars * layout.typlistEntryLen, "<variable_types>", "</variable_types>")
    val typlist = (0 until nVars).map { i =>
      if (layout.typlistEntryLen == 1) typBuf(i) & 0xff
      else Bin.u16(typBuf, i * 2, little)
    }
    def strTable(entryLen: Int, startTag: String, endTag: String): Vector[String] = {
      val b = chunk(nVars * entryLen, startTag, endTag)
      (0 until nVars).map(i => Bin.zstr(b, i * entryLen, entryLen, cs)).toVector
    }
    val names = strTable(layout.varNameLen, "<varnames>", "</varnames>")
    chunk((nVars + 1) * layout.srtEntryLen, "<sortlist>", "</sortlist>")
    val formats = strTable(layout.fmtLen, "<formats>", "</formats>")
    val vlNames = strTable(layout.lblNameLen, "<value_label_names>", "</value_label_names>")
    val varLabels = strTable(layout.varLabelLen, "<variable_labels>", "</variable_labels>")

    val variables = (0 until nVars).map { i =>
      val vt = typecodeToVarType(typlist(i), layout)
      Variable(names(i), vt,
        formats.lift(i).filter(_.nonEmpty),
        vlNames.lift(i).filter(_.nonEmpty),
        varLabels.lift(i).filter(_.nonEmpty))
    }.toVector

    // ---- legacy expansion fields → data offset ----
    if (!layout.xmlish) {
      if (layout.expansionLenLen > 0) {
        var done = false
        while (!done) {
          val dt = c.u8()
          val len =
            if (layout.expansionLenLen == 2) c.u16(little)
            else c.u32(little).toInt
          if (dt == 0 && len == 0) done = true
          else {
            require(dt == 1 && len <= (1 << 20), "invalid expansion field")
            c.seek(c.pos + len)
          }
        }
      }
      dataOffset = c.pos
    }

    val rowLen = variables.map(_.varType.width).sum.toLong
    if (vlOffset == 0 && dataOffset > 0)
      vlOffset = dataOffset + rowLen * nObs

    // ---- value labels ----
    val valueLabels = readValueLabels(c, version, little, layout, cs, vlOffset)

    Metadata(version, little, nVars, nObs, dataLabel, timestamp, variables,
      dataOffset, strlsOffset, vlOffset, valueLabels)
  }

  private def typecodeToVarType(code: Int, layout: Layout): VarType =
    layout.typlistVersion match {
      case 111 => code match {
        case 0xFB => TByte
        case 0xFC => TInt
        case 0xFD => TLong
        case 0xFE => TFloat
        case 0xFF => TDouble
        case n => TStr(n)
      }
      case 117 => code match {
        case 0xFFFA => TByte
        case 0xFFF9 => TInt
        case 0xFFF8 => TLong
        case 0xFFF7 => TFloat
        case 0xFFF6 => TDouble
        case 0x8000 => TStrL
        case n => TStr(n)
      }
      case _ =>
        if (code < 0x7F) code.toChar match {
          case 'b' => TByte
          case 'i' => TInt
          case 'l' => TLong
          case 'f' => TFloat
          case 'd' => TDouble
          case other => throw new IllegalArgumentException(s"bad typecode $other")
        } else TStr(code - 0x7F)
    }

  private def readValueLabels(c: Cur, version: Int, little: Boolean,
      layout: Layout, cs: java.nio.charset.Charset, offset: Long): Vector[ValueLabelTable] = {
    if (offset <= 0) return Vector.empty
    try {
      c.seek(offset)
      if (layout.xmlish && !c.tryTag("<value_labels>")) return Vector.empty
      val out = Vector.newBuilder[ValueLabelTable]
      var done = false
      val rules = missingRules(version)
      while (!done) {
        if (layout.vlLenLen == 2) {
          // pre-105 layout: len(u16) + labname(12) + pad(2) + 8-byte slots
          c.bytesOrNone(2) match {
            case None => done = true
            case Some(lb) =>
              val len = Bin.u16(lb, 0, little)
              val nameB = c.bytes(layout.vlLabnameLen)
              val labname = Bin.zstr(nameB, 0, nameB.length, cs)
              c.seek(c.pos + layout.vlPaddingLen)
              val table = c.bytes(len)
              val n = len / 8
              val m = Map.newBuilder[Int, String]
              var i = 0
              while (i < n) {
                val label = Bin.zstr(table, i * 8, 8, cs)
                if (label.nonEmpty) m += i -> label
                i += 1
              }
              out += ValueLabelTable(labname, m.result())
          }
        } else {
          if (layout.xmlish && !c.tryTag("<lbl>")) { done = true }
          else c.bytesOrNone(4) match {
            case None => done = true
            case Some(lb) =>
              val len = Bin.i32(lb, 0, little)
              val nameB = c.bytes(layout.vlLabnameLen)
              val labname = Bin.zstr(nameB, 0, nameB.length, cs)
              c.seek(c.pos + layout.vlPaddingLen)
              if (len < 8) { if (layout.xmlish) c.tryTag("</lbl>") }
              else {
                val table = c.bytes(len)
                if (layout.xmlish) c.expectTag("</lbl>")
                val n = Bin.i32(table, 0, little)
                val txtlen = Bin.i32(table, 4, little)
                if (txtlen <= len - 8 && n <= (len - 8 - txtlen) / 8) {
                  val m = Map.newBuilder[Int, String]
                  val txtStart = 8 + n * 8
                  var i = 0
                  while (i < n) {
                    val off = Bin.i32(table, 8 + i * 4, little)
                    val v = Bin.i32(table, 8 + n * 4 + i * 4, little)
                    if (off < txtlen) {
                      val label = Bin.zstr(table, txtStart + off, txtlen - off, cs)
                      if (label.nonEmpty &&
                          !(rules.sysMissingEnabled && v >= rules.sysInt32))
                        m += v -> label
                    }
                    i += 1
                  }
                  out += ValueLabelTable(labname, m.result())
                } else done = true
              }
          }
        }
      }
      out.result()
    } catch {
      case _: java.io.EOFException | _: IllegalArgumentException => Vector.empty
    }
  }

  /** Load the strL (GSO) table: (v,o) → decoded string.
    * Reference behavior: data.rs:874-977. */
  def loadStrls(path: String, md: Metadata): Map[(Int, Long), String] = {
    if (md.strlsOffset <= 0 || md.version < 117) return Map.empty
    val raf = new RandomAccessFile(path, "r")
    try {
      val c = new Cur(raf)
      c.seek(md.strlsOffset)
      if (!c.tryTag("<strls>")) return Map.empty
      val m = Map.newBuilder[(Int, Long), String]
      var done = false
      while (!done) {
        if (c.tryTag("GSO")) {
          var v = c.u32(md.littleEndian).toInt
          var o = if (md.version >= 118) c.u64(md.littleEndian) else c.u32(md.littleEndian)
          if (md.version >= 118) { v = v & 0xFFFF; o = o & 0x0000FFFFFFFFFFFFL }
          val typ = c.u8()
          val len = c.i32(md.littleEndian)
          require(len >= 0, "negative strL length")
          if (typ == 0x82) { // GSO type 130 = string payload
            val b = c.bytes(len)
            var s = new String(b, md.charset)
            while (s.nonEmpty && s.last == 0.toChar) s = s.dropRight(1)
            m += (v, o) -> s
          } else c.seek(c.pos + len) // type 129 = binary: not surfaced
        } else if (c.tryTag("</strls>")) done = true
        else throw new IllegalArgumentException("invalid strls tag")
      }
      m.result()
    } finally raf.close()
  }
}
