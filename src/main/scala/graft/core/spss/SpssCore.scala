package graft.core.spss

import java.io.RandomAccessFile
import java.nio.charset.{Charset, StandardCharsets}
import graft.core.Bin

/** SPSS .sav/.zsav data model + header/dictionary parser.
  *
  * Format facts follow the public SAV specification (loc.gov fdd000468 /
  * PSPP documentation); behavioral reference: /root/reference
  * crates/polars_readstat_rs/src/spss/{header.rs, metadata.rs:133-520,
  * data.rs:14-19,205-355,993-1052}.
  */
object SpssCore {

  val SecShift: Long = 12219379200L // seconds 1582-10-14 → 1970-01-01
  val MissingBits: Long = 0xFFEFFFFFFFFFFFFFL
  val LowestBits: Long = 0xFFEFFFFFFFFFFFFEL
  val HighestBits: Long = 0x7FEFFFFFFFFFFFFFL

  final case class SpssVar(
      name: String,
      shortName: String,
      isString: Boolean,
      stringLen: Int,       // declared byte length (post very-long coalesce)
      widthUnits: Int,      // 8-byte units occupied in a record
      offsetUnits: Int,
      formatType: Int, formatWidth: Int, formatDecimals: Int,
      label: Option[String],
      measure: Option[String], alignment: Option[String], displayWidth: Option[Int],
      missingRange: Boolean,
      missingDoubles: Vector[Double],
      missingStrings: Vector[String],
      numLabels: Map[Double, String],
      strLabels: Map[String, String],
      valueLabelName: Option[String]) {

    /** Temporal class from the print-format code
      * (docs/read.md:326-345: Date 20/23/24/38/39, Time 21/25, DateTime 22/41). */
    def formatClass: Option[String] = formatType match {
      case 20 | 23 | 24 | 38 | 39 => Some("Date")
      case 21 | 25 => Some("Time")
      case 22 | 41 => Some("DateTime")
      case _ => None
    }
  }

  final case class SpssMeta(
      little: Boolean,
      compression: Int, // 0 none, 1 bytecode, 2 zsav
      nCases: Long,     // -1 = unknown
      bias: Double,
      fileLabel: Option[String],
      vars: Vector[SpssVar],
      dataOffset: Long,
      charset: Charset,
      creationDate: Option[String] = None,  // "dd mmm yy" as recorded
      creationTime: Option[String] = None) {
    def recordUnits: Int = vars.map(_.widthUnits).sum
    def recordLen: Int = recordUnits * 8
  }

  private class Cur(raf: RandomAccessFile, val little: Boolean) {
    def pos: Long = raf.getFilePointer
    def seek(p: Long): Unit = raf.seek(p)
    // in-file length fields (record counts, label/string widths) size the
    // allocations here; corrupt values must throw, not allocate gigabytes
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && n <= raf.length() - raf.getFilePointer,
        s"corrupt sav: field of $n bytes exceeds the " +
          s"${raf.length() - raf.getFilePointer} remaining in the file")
      val b = new Array[Byte](n); raf.readFully(b); b
    }
    def u8(): Int = raf.readUnsignedByte()
    def i32(): Int = Bin.i32(bytes(4), 0, little)
    def i64(): Long = Bin.i64(bytes(8), 0, little)
    def f64(): Double = java.lang.Double.longBitsToDouble(Bin.i64(bytes(8), 0, little))
  }

  private def codePageCharset(code: Int): Option[Charset] = code match {
    case 65001 => Some(StandardCharsets.UTF_8)
    case 1250 => tryCs("windows-1250")
    case 1251 => tryCs("windows-1251")
    case 1252 => tryCs("windows-1252")
    case 1253 => tryCs("windows-1253")
    case 1254 => tryCs("windows-1254")
    case 1255 => tryCs("windows-1255")
    case 1256 => tryCs("windows-1256")
    case 20127 => Some(StandardCharsets.US_ASCII)
    case 28591 => Some(StandardCharsets.ISO_8859_1)
    case 950 => tryCs("Big5")
    case 936 => tryCs("GBK")
    case 932 => tryCs("Shift_JIS")
    case _ => None
  }
  private def tryCs(n: String): Option[Charset] =
    try Some(Charset.forName(n)) catch { case _: Exception => None }

  def parse(path: String): SpssMeta = {
    val raf = new RandomAccessFile(path, "r")
    try parseWith(raf) finally raf.close()
  }

  private def parseWith(raf: RandomAccessFile): SpssMeta = {
    val head = new Array[Byte](176)
    raf.readFully(head)
    val magic = new String(head, 0, 4, StandardCharsets.US_ASCII)
    require(magic == "$FL2" || magic == "$FL3", s"not a sav file: $magic")
    val little = {
      val lo = Bin.i32(head, 64, little = true)
      if (lo == 2 || lo == 3) true
      else {
        val hi = Bin.i32(head, 64, little = false)
        require(hi == 2 || hi == 3, "unknown SPSS layout code")
        false
      }
    }
    var compression = Bin.i32(head, 72, little)
    val nCases = Bin.i32(head, 80, little).toLong
    val bias = java.lang.Double.longBitsToDouble(Bin.i64(head, 84, little))
    val fileLabel = {
      val s = Bin.zstr(head, 109, 64, StandardCharsets.US_ASCII).trim
      if (s.isEmpty) None else Some(s)
    }
    def headStr(off: Int, len: Int): Option[String] = {
      val s = Bin.zstr(head, off, len, StandardCharsets.US_ASCII).trim
      if (s.isEmpty) None else Some(s)
    }
    val creationDate = headStr(92, 9)
    val creationTime = headStr(101, 8)
    if (magic == "$FL3" && compression < 2) compression = 2

    // --- prescan for encoding (subtype 20 wins, else integer-info code) ---
    val dictStart = raf.getFilePointer
    val charset = prescanEncoding(new Cur(raf, little))
      .getOrElse(tryCs("windows-1252").getOrElse(StandardCharsets.ISO_8859_1))
    raf.seek(dictStart)

    // --- dictionary ---
    val c = new Cur(raf, little)
    val vars = Vector.newBuilder[RawVar]
    var raws = Vector.empty[RawVar]
    final case class PendingLabels(raw: Vector[(Array[Byte], String)], offsets: Vector[Int])
    var pendings = Vector.empty[PendingLabels]
    var longNames = Map.empty[String, String]     // short → long
    var veryLong = Map.empty[String, Int]         // short → declared len
    var lsvlRaws = Vector.empty[Array[Byte]]      // subtype 21 payloads
    var lsmvRaws = Vector.empty[Array[Byte]]      // subtype 22 payloads
    var displayParams: Option[Array[Int]] = None
    var dataOffset = 0L
    var unitOffset = 0

    var done = false
    while (!done) {
      c.i32() match {
        case 2 =>
          val typ = c.i32()
          val hasLabel = c.i32()
          val nMissing = c.i32()
          val printFmt = c.i32()
          c.i32() // write fmt
          val name = Bin.zstr(c.bytes(8), 0, 8, charset).trim
          if (typ < 0) {
            // string continuation: widen the previous variable
            raws = raws.init :+ raws.last.copy(widthUnits = raws.last.widthUnits + 1)
            unitOffset += 1
            if (hasLabel != 0) { val len = c.i32(); c.bytes((len + 3) / 4 * 4) }
            if (nMissing != 0) c.bytes(math.abs(nMissing) * 8)
          } else {
            var label: Option[String] = None
            if (hasLabel != 0) {
              val len = c.i32()
              val b = c.bytes((len + 3) / 4 * 4)
              val s = new String(b, 0, math.min(len, b.length), charset).trim
              if (s.nonEmpty) label = Some(s)
            }
            var missD = Vector.empty[Double]
            var missS = Vector.empty[String]
            var missRange = false
            if (nMissing != 0) {
              val n = math.abs(nMissing)
              missRange = nMissing < 0
              (0 until n).foreach { _ =>
                val b = c.bytes(8)
                if (typ == 0) missD :+= java.lang.Double.longBitsToDouble(Bin.i64(b, 0, little))
                else missS :+= trimSav(new String(b, charset))
              }
            }
            raws :+= RawVar(name, typ, 1, unitOffset, printFmt, label,
              missRange, missD, missS)
            unitOffset += 1
          }
        case 3 =>
          val count = c.i32()
          val entries = (0 until count).map { _ =>
            val raw = c.bytes(8)
            val len = c.u8()
            val padded = (len + 8) / 8 * 8 - 1
            val lb = c.bytes(padded)
            (raw, new String(lb, 0, math.min(len, lb.length), charset).trim)
          }.toVector
          val rec4 = c.i32()
          require(rec4 == 4, "expected value-label variables record")
          val nv = c.i32()
          val offs = (0 until nv).map(_ => c.i32()).toVector
          pendings :+= PendingLabels(entries, offs)
        case 4 =>
          val nv = c.i32(); c.bytes(nv * 4)
        case 6 =>
          val lines = c.i32(); c.bytes(lines * 80)
        case 7 =>
          val subtype = c.i32()
          val size = c.i32()
          val count = c.i32()
          val data = c.bytes(size * count)
          subtype match {
            case 11 => // display params
              displayParams = Some((0 until count).map(i => Bin.i32(data, i * 4, little)).toArray)
            case 13 =>
              new String(data, charset).split("\t").foreach { pair =>
                val i = pair.indexOf('=')
                if (i > 0) longNames += pair.substring(0, i).trim -> pair.substring(i + 1).trim
              }
            case 14 =>
              new String(data, StandardCharsets.US_ASCII).split("\t").foreach { pair0 =>
                val pair = pair0.replace(" ", "")
                val i = pair.indexOf('=')
                if (i > 0 && pair.substring(i + 1).trim.nonEmpty)
                  veryLong += pair.substring(0, i).trim -> pair.substring(i + 1).trim.toInt
              }
            case 21 => lsvlRaws :+= data // long-string value labels (post-coalesce)
            case 22 => lsmvRaws :+= data // long-string missing values (post-coalesce)
            case _ => // 3/4/20 handled in prescan; 16 unsurfaced (reference parity)
          }
        case 999 =>
          c.i32() // filler
          dataOffset = c.pos
          done = true
        case other =>
          throw new IllegalArgumentException(s"unknown SPSS record type $other")
      }
    }

    // --- very-long-string coalescing (metadata.rs:640-678) ---
    var coalesced = Vector.empty[RawVar]
    var i = 0
    while (i < raws.length) {
      val v = raws(i)
      val declared = veryLong.getOrElse(v.name, v.typ)
      if (v.typ > 0 && declared > 255) {
        val nSeg = (declared + 251) / 252
        val group = raws.slice(i, i + nSeg)
        coalesced :+= v.copy(typ = declared, widthUnits = group.map(_.widthUnits).sum)
        i += nSeg
      } else { coalesced :+= v; i += 1 }
    }

    // rebuild unit offsets after coalescing
    var off = 0
    coalesced = coalesced.map { v =>
      val r = v.copy(offsetUnits = off); off += v.widthUnits; r
    }

    // --- value labels → per-var maps (offsets are 1-based record units) ---
    val byOffset: Map[Int, Int] =
      coalesced.zipWithIndex.flatMap { case (v, idx) =>
        (v.offsetUnits until v.offsetUnits + v.widthUnits).map(_ -> idx)
      }.toMap
    val numLab = Array.fill(coalesced.length)(Map.empty[Double, String])
    val strLab = Array.fill(coalesced.length)(Map.empty[String, String])
    val labName = Array.fill[Option[String]](coalesced.length)(None)
    pendings.zipWithIndex.foreach { case (p, pi) =>
      p.offsets.foreach { o =>
        byOffset.get(o - 1).foreach { idx =>
          val v = coalesced(idx)
          labName(idx) = Some(s"labels$pi")
          if (v.typ == 0)
            numLab(idx) ++= p.raw.map { case (b, l) =>
              java.lang.Double.longBitsToDouble(Bin.i64(b, 0, little)) -> l }
          else
            strLab(idx) ++= p.raw.map { case (b, l) => trimSav(new String(b, charset)) -> l }
        }
      }
    }

    // --- subtype 21: value labels for strings wider than 8 bytes ---
    // (metadata.rs:725-801; the type-3/4 records above only carry 8-byte
    // values). Per variable: pascal name, u32 declared width, u32 label
    // count, then (u32-len value, u32-len label) pairs. Names match the
    // long OR short variable name case-insensitively; label-set naming
    // continues the type-3 "labelsN" sequence, as the reference does.
    val nameToIdx: Map[String, Int] = {
      val m = scala.collection.mutable.LinkedHashMap[String, Int]()
      coalesced.zipWithIndex.foreach { case (v, idx) =>
        val long = longNames.getOrElse(v.name, v.name)
        m.getOrElseUpdate(long.toLowerCase, idx)
        m.getOrElseUpdate(v.name.toLowerCase, idx)
      }
      m.toMap
    }
    var labelSetIdx = pendings.length
    lsvlRaws.foreach { data =>
      var pos = 0
      def u32(what: String): Int = {
        require(pos + 4 <= data.length,
          s"corrupt sav: truncated long-string value label record ($what)")
        val v = Bin.i32(data, pos, little); pos += 4; v
      }
      def str(len: Int, what: String): String = {
        // Long arithmetic: a 0x7FFFFFFF length would overflow pos + len
        // to negative and sail past an Int bounds check
        require(len >= 0 && pos.toLong + len <= data.length,
          s"corrupt sav: long-string value label $what overruns the record")
        val s = new String(data, pos, len, charset); pos += len; s
      }
      var go = true
      while (go && pos < data.length) {
        val name = str(u32("name length"), "variable name")
        if (pos >= data.length) go = false // trailing padding after last entry
        else {
          u32("width") // declared width — layout already fixed by var records
          val nLab = u32("label count")
          var entries = Map.empty[String, String]
          var k = 0
          while (k < nLab) {
            val value = trimSav(str(u32("value length"), "value"))
            val label = str(u32("label length"), "label")
            if (label.nonEmpty) entries += value -> label
            k += 1
          }
          val setName = s"labels$labelSetIdx"; labelSetIdx += 1
          nameToIdx.get(name.toLowerCase).foreach { idx =>
            strLab(idx) ++= entries
            labName(idx) = Some(setName)
          }
        }
      }
    }

    // --- subtype 22: declared missing values for long strings ---
    // (metadata.rs:804-853). Per variable: pascal name, u8 count (1-3),
    // u32 shared value length, then count values of that length.
    val lsMissing = scala.collection.mutable.Map[Int, Vector[String]]()
    lsmvRaws.foreach { data =>
      var pos = 0
      def u32(what: String): Int = {
        require(pos + 4 <= data.length,
          s"corrupt sav: truncated long-string missing record ($what)")
        val v = Bin.i32(data, pos, little); pos += 4; v
      }
      while (pos < data.length) {
        val nameLen = u32("name length")
        require(nameLen >= 0 && pos.toLong + nameLen <= data.length,
          "corrupt sav: long-string missing name overruns the record")
        val name = new String(data, pos, nameLen, charset); pos += nameLen
        require(pos < data.length,
          "corrupt sav: unexpected end in long-string missing values")
        val n = data(pos) & 0xff; pos += 1
        require(n >= 1 && n <= 3,
          s"corrupt sav: long-string missing count $n not in [1, 3]")
        val len = u32("value length")
        val values = (0 until n).map { _ =>
          require(len >= 0 && pos.toLong + len <= data.length,
            "corrupt sav: long-string missing value overruns the record")
          val s = trimSav(new String(data, pos, len, charset)); pos += len; s
        }.toVector
        nameToIdx.get(name.toLowerCase).foreach(idx => lsMissing(idx) = values)
      }
    }

    // --- display params (per var or per segment; 2 or 3 per entry) ---
    val (measures, aligns, dwidths) = decodeDisplay(displayParams, coalesced)

    val out = coalesced.zipWithIndex.map { case (v, idx) =>
      val fmt = v.printFmt
      SpssVar(
        name = longNames.getOrElse(v.name, v.name),
        shortName = v.name,
        isString = v.typ > 0,
        stringLen = if (v.typ > 0) v.typ else 0,
        widthUnits = v.widthUnits,
        offsetUnits = v.offsetUnits,
        formatType = (fmt >> 16) & 0xff,
        formatWidth = (fmt >> 8) & 0xff,
        formatDecimals = fmt & 0xff,
        label = v.label,
        measure = measures(idx), alignment = aligns(idx), displayWidth = dwidths(idx),
        missingRange = v.missRange,
        missingDoubles = v.missD,
        missingStrings = lsMissing.getOrElse(idx, v.missS),
        numLabels = numLab(idx), strLabels = strLab(idx),
        valueLabelName = labName(idx))
    }

    val meta = SpssMeta(little, compression, nCases, bias, fileLabel, out,
      dataOffset, charset, creationDate, creationTime)
    // recordLen sizes every row/batch buffer downstream; SPSS widths are
    // at most 32767 bytes per variable (segments of ≤255 units), so a
    // record beyond 64 MiB only arises from corrupt width fields
    require(meta.recordLen >= 0 && meta.recordLen <= (1 << 26),
      s"corrupt sav: record length ${meta.recordLen} exceeds the 64 MiB sanity bound")
    meta
  }

  private final case class RawVar(
      name: String, typ: Int, widthUnits: Int, offsetUnits: Int,
      printFmt: Int, label: Option[String],
      missRange: Boolean, missD: Vector[Double], missS: Vector[String])

  private def decodeDisplay(params: Option[Array[Int]], vars: Vector[RawVar])
      : (Array[Option[String]], Array[Option[String]], Array[Option[Int]]) = {
    val n = vars.length
    val measures = Array.fill[Option[String]](n)(None)
    val aligns = Array.fill[Option[String]](n)(None)
    val widths = Array.fill[Option[Int]](n)(None)
    params.foreach { vals =>
      // three counting conventions exist in the wild; vars here are the
      // POST-coalescing logical columns:
      //  - one entry per logical variable,
      //  - one per DICTIONARY variable (very-long-string segments each
      //    count, continuations don't — the SPSS/PSPP spec convention),
      //  - one per 8-byte record unit (continuations count).
      val totalSeg = vars.map(v => math.max(1, v.widthUnits)).sum
      def dictSegs(v: RawVar): Int =
        if (v.typ > 255) (v.typ + 251) / 252 else 1
      val totalDict = vars.map(dictSegs).sum
      val (per, step): (Int, RawVar => Int) =
        if (vals.length == n * 3) (3, _ => 1)
        else if (vals.length == n * 2) (2, _ => 1)
        else if (vals.length == totalDict * 3) (3, dictSegs)
        else if (vals.length == totalDict * 2) (2, dictSegs)
        else if (vals.length == totalSeg * 3) (3, v => math.max(1, v.widthUnits))
        else if (vals.length == totalSeg * 2) (2, v => math.max(1, v.widthUnits))
        else return (measures, aligns, widths)
      var pos = 0
      vars.zipWithIndex.foreach { case (v, i) =>
        if (pos + per <= vals.length) {
          measures(i) = vals(pos) match {
            case 0 => Some("Unknown"); case 1 => Some("Nominal")
            case 2 => Some("Ordinal"); case 3 => Some("Scale"); case _ => None
          }
          if (per == 3) {
            widths(i) = Some(vals(pos + 1))
            aligns(i) = vals(pos + 2) match {
              case 0 => Some("Left"); case 1 => Some("Right")
              case 2 => Some("Center"); case _ => None
            }
          } else aligns(i) = vals(pos + 1) match {
            case 0 => Some("Left"); case 1 => Some("Right")
            case 2 => Some("Center"); case _ => None
          }
          pos += per * step(v)
        }
      }
    }
    (measures, aligns, widths)
  }

  private def prescanEncoding(c: Cur): Option[Charset] = {
    var fallback: Option[Charset] = None
    try {
      var done = false
      while (!done) {
        c.i32() match {
          case 2 =>
            val buf = c.bytes(28)
            val hasLabel = Bin.i32(buf, 4, c.little)
            val nMissing = Bin.i32(buf, 8, c.little)
            if (hasLabel != 0) { val len = c.i32(); c.bytes((len + 3) / 4 * 4) }
            if (nMissing != 0) c.bytes(math.abs(nMissing) * 8)
          case 3 =>
            val count = c.i32()
            (0 until count).foreach { _ =>
              c.bytes(8); val l = c.u8(); c.bytes((l + 8) / 8 * 8 - 1)
            }
            c.i32(); val nv = c.i32(); c.bytes(nv * 4)
          case 4 => val nv = c.i32(); c.bytes(nv * 4)
          case 6 => val lines = c.i32(); c.bytes(lines * 80)
          case 7 =>
            val subtype = c.i32(); val size = c.i32(); val count = c.i32()
            val data = c.bytes(size * count)
            if (subtype == 20 && data.nonEmpty) {
              val name = new String(data, StandardCharsets.US_ASCII).trim
              val cs = tryCs(name).orElse(tryCs(name.toUpperCase))
              if (cs.isDefined) return cs
            } else if (subtype == 3 && data.length >= 32) {
              val code = Bin.i32(data, 28, c.little)
              if (code > 0) codePageCharset(code).foreach(e => fallback = Some(e))
            }
          case _ => done = true
        }
      }
      fallback
    } catch { case _: Exception => fallback }
  }

  /** Trim SAV space/NUL padding from a decoded string. */
  def trimSav(s: String): String = {
    var end = s.length
    while (end > 0 && (s(end - 1) == ' ' || s(end - 1) == 0.toChar)) end -= 1
    s.substring(0, end)
  }

  /** Reassemble a very-long-string payload: 255 data bytes per 256-byte
    * chunk (data.rs:1028-1052). */
  def reconstructVeryLong(buf: Array[Byte], start: Int, storageLen: Int,
      declaredLen: Int): Array[Byte] = {
    val target = math.min(declaredLen, storageLen)
    if (target <= 255) return java.util.Arrays.copyOfRange(buf, start, start + target)
    val out = new java.io.ByteArrayOutputStream(target)
    var rowOff = 0
    while (target - out.size() > 255 && rowOff + 255 <= storageLen) {
      out.write(buf, start + rowOff, 255)
      rowOff += 256
    }
    val rem = target - out.size()
    if (rem > 0 && rowOff + rem <= storageLen) out.write(buf, start + rowOff, rem)
    out.toByteArray
  }
}
