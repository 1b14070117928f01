package graft.core.por

import java.io.{BufferedInputStream, FileInputStream}
import java.nio.charset.StandardCharsets

/** SPSS portable (.por) core: 80-column line-padded ASCII stream, base-30
  * numbers, translated character table. Sequential single-pass by design.
  * Behavioral reference: /root/reference crates/polars_readstat_rs/src/
  * spss/por.rs.
  */
object PorCore {

  val LineLen = 80
  val SecShift: Long = 12219379200L

  /** POR table position i → ASCII char (por.rs:22-55). */
  val PorAsciiLookup: Array[Byte] = {
    val t = new Array[Byte](256)
    for (i <- 0 to 9) t(64 + i) = ('0' + i).toByte
    for (i <- 0 until 26) { t(74 + i) = ('A' + i).toByte; t(100 + i) = ('a' + i).toByte }
    val punct: Seq[(Int, Char)] = Seq(126 -> ' ', 127 -> '.', 128 -> '<', 129 -> '(',
      130 -> '+', 131 -> '|', 132 -> '&', 133 -> '[', 134 -> ']', 135 -> '!',
      136 -> '$', 137 -> '*', 138 -> ')', 139 -> ';', 140 -> '^', 141 -> '-',
      142 -> '/', 143 -> '|', 144 -> ',', 145 -> '%', 146 -> '_', 147 -> '>',
      148 -> '?', 149 -> '`', 150 -> ':', 151 -> '#', 152 -> '@', 153 -> '\'',
      154 -> '=', 155 -> '"', 162 -> '~', 184 -> '{', 185 -> '}', 186 -> '\\')
    punct.foreach { case (i, c) => t(i) = c.toByte }
    t
  }

  final case class PorVar(name: String, width: Int, fmtType: Int,
      fmtWidth: Int, fmtDec: Int, label: Option[String],
      numLabels: Map[Double, String] = Map.empty,
      strLabels: Map[String, String] = Map.empty,
      missingDoubles: Vector[Double] = Vector.empty,
      missingStrings: Vector[String] = Vector.empty,
      missingLoThru: Option[Double] = None, // tag '9': LO THRU x
      missingHiThru: Option[Double] = None, // tag 'A': x THRU HI
      missingRange: Option[(Double, Double)] = None) { // tag 'B'
    def hasMissing: Boolean =
      missingDoubles.nonEmpty || missingStrings.nonEmpty ||
        missingLoThru.isDefined || missingHiThru.isDefined ||
        missingRange.isDefined
    def isString: Boolean = width > 0
    def formatClass: Option[String] = {
      if (isString) return None
      val c = if (fmtType > 82) fmtType - 82 else fmtType
      c match {
        case 20 | 23 | 24 | 38 | 39 => Some("Date")
        case 21 | 25 => Some("Time")
        case 22 | 41 => Some("DateTime")
        case _ => None
      }
    }
  }

  final case class PorMeta(fileLabel: String, vars: Vector[PorVar],
      created: Option[String] = None, // "yyyymmdd hh:mm:ss" as recorded
      charTable: Array[Byte] = null) // raw 256-byte translation table

  /** Decoder state at a row boundary: file bytes consumed, position
    * within the current 80-char line, and virtual pad spaces still
    * pending from a short line. Lets an executor resume decoding
    * mid-stream without replaying everything before its range — the
    * POR analog of [[graft.spark.readstat.SavCheckpoint]]. */
  final case class PorCkpt(row: Long, byteOff: Long, pos: Int, pending: Int)

  final case class PorIndex(rows: Long, cps: Vector[PorCkpt])

  /** Line-aware logical byte stream with char-table translation.
    * `resumeAt`/`pos0`/`pending0`/`table` restore a [[PorCkpt]]: the
    * cell encoding is position-independent, so a stream opened at a row
    * boundary with its line state decodes identically to a sequential
    * pass. */
  final class PorStream(path: String, resumeAt: Long = 0L, pos0: Int = 0,
      pending0: Int = 0, table: Array[Byte] = null) {
    private val in = new BufferedInputStream(new FileInputStream(path), 1 << 20)
    if (resumeAt > 0) {
      var left = resumeAt
      while (left > 0) {
        val sk = in.skip(left)
        require(sk > 0, s"por: cannot seek to offset $resumeAt in $path")
        left -= sk
      }
    }
    // each translated char is ≥1 file byte, so no in-stream length field
    // (string widths, label counts) can legitimately exceed the file size
    // — corrupt lengths must throw, not size a multi-GB allocation
    private val fileLen = new java.io.File(path).length()
    private def checkLen(n: Int): Unit =
      require(n >= 0 && n <= fileLen,
        s"corrupt por: length field $n exceeds the $fileLen-byte file")
    private var consumed: Long = resumeAt
    private var pos = pos0
    private var pendingSpaces = pending0
    private var space: Byte = ' '
    private var byte2char: Array[Byte] = Array.tabulate(256)(_.toByte)
    if (table != null) setCharTable(table)

    /** Checkpoint state (valid at a row boundary). */
    def bytesConsumed: Long = consumed
    def linePos: Int = pos
    def pendingCount: Int = pendingSpaces

    def close(): Unit = in.close()

    private def rawByte(): Int = {
      if (pendingSpaces > 0) { pendingSpaces -= 1; return space & 0xff }
      val b = in.read()
      if (b >= 0) consumed += 1
      b
    }

    def readByte(): Int = {
      while (true) {
        rawByte() match {
          case -1 => return -1
          case '\r' =>
            in.mark(1)
            val nxt = in.read()
            if (nxt == '\n') consumed += 1
            else if (nxt != -1) in.reset()
            pendingSpaces = math.max(0, LineLen - pos); pos = 0
          case '\n' =>
            pendingSpaces = math.max(0, LineLen - pos); pos = 0
          case b =>
            pos += 1
            return b
        }
      }
      -1
    }

    /** Skip n translated chars without materializing them. */
    def skipChars(n: Int): Unit = {
      checkLen(n)
      var i = 0
      while (i < n) {
        require(readByte() >= 0, "unexpected EOF in POR stream")
        i += 1
      }
    }

    def readNRaw(n: Int): Array[Byte] = {
      checkLen(n)
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val b = readByte()
        require(b >= 0, "unexpected EOF in POR stream")
        out(i) = b.toByte; i += 1
      }
      out
    }

    def setCharTable(lookup: Array[Byte]): Unit = {
      byte2char = new Array[Byte](256)
      for (i <- 0 until 256) {
        val ch = PorAsciiLookup(i)
        if (ch != 0) byte2char(lookup(i) & 0xff) = ch
      }
      space = lookup(126)
      byte2char(lookup(64) & 0xff) = '0'
    }

    def readChar(): Int = {
      val b = readByte()
      if (b < 0) -1 else byte2char(b) & 0xff
    }

    def readChars(n: Int): Array[Byte] = {
      checkLen(n)
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = readChar().toByte; i += 1 }
      out
    }

    def readDouble(): Double = readDoublePeek(readChar())

    def readDoublePeek(first: Int): Double = {
      if (first == '*') {
        val c2 = readChar()
        require(c2 == '.', s"POR: expected '.' after '*', got ${c2.toChar}")
        return Double.NaN
      }
      val sb = new StringBuilder
      sb.append(first.toChar)
      var c = readChar()
      while (c != '/') {
        require(c >= 0, "EOF in base-30 number")
        sb.append(c.toChar); c = readChar()
      }
      parseBase30(sb.toString)
    }

    def readInt(): Long = {
      val v = readDouble()
      require(!v.isNaN && v >= 0, s"invalid POR integer $v")
      v.toLong
    }

    def readStringField(): String = {
      val len = readInt().toInt
      new String(readChars(len), StandardCharsets.ISO_8859_1)
    }

    /** None = 'Z' end-of-data marker. A raw EOF is NOT a valid end: a
      * portable file always closes with the 'Z' run, so hitting EOF
      * first means the file was cut — fail loudly instead of silently
      * returning the rows read so far. */
    private def truncated(): Nothing = throw new java.io.IOException(
      "por: stream ended without the 'Z' end-of-data marker — file truncated")
    def maybeDouble(): Option[Double] = {
      val c = readChar()
      if (c == 'Z') None
      else if (c < 0) truncated()
      else Some(readDoublePeek(c))
    }
    def maybeString(): Option[String] = {
      val c = readChar()
      if (c == 'Z') None
      else if (c < 0) truncated()
      else {
        val len = readDoublePeek(c).toInt
        Some(new String(readChars(len), StandardCharsets.ISO_8859_1))
      }
    }
  }

  def digit30(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'T') 10 + c - 'A'
    else -1

  def parseBase30(s: String): Double = {
    var i = 0
    val neg = i < s.length && s(i) == '-'
    if (neg || (i < s.length && s(i) == '+')) i += 1
    var num = 0.0
    while (i < s.length && s(i) != '.' && s(i) != '+' && s(i) != '-') {
      val d = digit30(s(i)); require(d >= 0, s"bad base-30 digit ${s(i)}")
      num = num * 30.0 + d; i += 1
    }
    var frac = 0.0
    if (i < s.length && s(i) == '.') {
      i += 1
      var denom = 30.0
      while (i < s.length && s(i) != '+' && s(i) != '-') {
        val d = digit30(s(i)); require(d >= 0, s"bad base-30 frac ${s(i)}")
        frac += d / denom; denom *= 30.0; i += 1
      }
    }
    var v = num + frac
    if (i < s.length) {
      val expNeg = s(i) == '-'
      i += 1
      var exp = 0.0
      while (i < s.length) {
        val d = digit30(s(i)); require(d >= 0, s"bad base-30 exp ${s(i)}")
        exp = exp * 30.0 + d; i += 1
      }
      if (exp != 0) v *= math.pow(30.0, if (expNeg) -exp else exp)
    }
    if (neg) -v else v
  }

  /** Parse header + variable records; stream positioned at first data cell
    * on return ('F' consumed). */
  def parseMeta(stream: PorStream): PorMeta = {
    val vanity = stream.readNRaw(200)
    val fileLabel = new String(vanity, 60, 20, StandardCharsets.ISO_8859_1).trim
    val lookup = stream.readNRaw(256)
    stream.setCharTable(lookup.clone())
    val sig = new String(stream.readChars(8), StandardCharsets.ISO_8859_1)
    require(sig == "SPSSPORT", s"not a POR file: $sig")
    stream.readChar() // version
    val creationDate = stream.readStringField()
    val creationTime = stream.readStringField()
    val created = s"$creationDate $creationTime".trim match {
      case "" => None
      case s => Some(s)
    }

    var vars = Vector.empty[PorVar]
    var done = false
    while (!done) {
      (stream.readChar(): @unchecked) match {
        case '1' | '2' | '3' => stream.readStringField()
        case '4' => stream.readInt()
        case '5' => stream.readInt() // precision
        case '6' => stream.readStringField()
        case '7' =>
          val width = stream.readInt().toInt
          val name = stream.readStringField()
          val pft = stream.readInt().toInt
          val pfw = stream.readInt().toInt
          val pfd = stream.readInt().toInt
          stream.readInt(); stream.readInt(); stream.readInt() // write fmt
          vars :+= PorVar(name, width, pft, pfw, pfd, None)
        // user-missing declarations: captured and attached to the last
        // variable (BEYOND the reference, which reads and discards them —
        // por.rs:388-415), giving POR the same missing-value surface as sav
        case '8' =>
          if (vars.lastOption.exists(_.isString)) {
            val v = stream.readStringField().replaceAll(" +$", "")
            vars = vars.init :+ vars.last.copy(
              missingStrings = vars.last.missingStrings :+ v)
          } else {
            val d = stream.readDouble()
            if (vars.nonEmpty) vars = vars.init :+ vars.last.copy(
              missingDoubles = vars.last.missingDoubles :+ d)
          }
        case '9' =>
          val x = stream.readDouble()
          if (vars.nonEmpty)
            vars = vars.init :+ vars.last.copy(missingLoThru = Some(x))
        case 'A' =>
          val x = stream.readDouble()
          if (vars.nonEmpty)
            vars = vars.init :+ vars.last.copy(missingHiThru = Some(x))
        case 'B' =>
          if (vars.lastOption.exists(_.isString)) {
            // SPSS has no string missing RANGES; treat the pair as two
            // discrete missing strings rather than inventing an ordering
            val lo = stream.readStringField().replaceAll(" +$", "")
            val hi = stream.readStringField().replaceAll(" +$", "")
            vars = vars.init :+ vars.last.copy(
              missingStrings = vars.last.missingStrings :+ lo :+ hi)
          } else {
            val lo = stream.readDouble(); val hi = stream.readDouble()
            if (vars.nonEmpty) vars = vars.init :+ vars.last.copy(
              missingRange = Some((math.min(lo, hi), math.max(lo, hi))))
          }
        case 'C' =>
          val label = stream.readStringField()
          if (vars.nonEmpty) vars = vars.init :+ vars.last.copy(label = Some(label))
        case 'D' =>
          // value-label set: captured and attached to the named variables
          // (BEYOND the reference, which parses and discards these —
          // por.rs:441-446). A set is homogeneous: all its variables share
          // one type, so the first name decides numeric vs string codes.
          val nVars = stream.readInt()
          val names = (0L until nVars).map(_ => stream.readStringField()).toVector
          val isString =
            names.headOption.exists(n => vars.exists(v => v.name == n && v.isString))
          val nLabels = stream.readInt()
          val numPairs = Map.newBuilder[Double, String]
          val strPairs = Map.newBuilder[String, String]
          (0L until nLabels).foreach { _ =>
            if (isString) {
              val code = stream.readStringField()
              // stored codes may carry trailing pad spaces; row decode
              // trims trailing spaces, so trim the keys to match
              strPairs += (code.replaceAll(" +$", "") -> stream.readStringField())
            } else numPairs += (stream.readDouble() -> stream.readStringField())
          }
          val nm = numPairs.result(); val sm = strPairs.result()
          val nameSet = names.toSet
          vars = vars.map { v =>
            if (!nameSet(v.name)) v
            else if (v.isString) v.copy(strLabels = v.strLabels ++ sm)
            else v.copy(numLabels = v.numLabels ++ nm)
          }
        case 'E' =>
          val n = stream.readInt()
          (0L until n).foreach(_ => stream.readStringField())
        case 'F' => done = true
        case other =>
          throw new IllegalArgumentException(s"POR: unexpected tag '${other.toChar}'")
      }
    }
    PorMeta(fileLabel, vars, created, lookup)
  }

  /** Advance past one data row without materializing any value (cell
    * boundaries only: string cells skip their declared length, numeric
    * cells scan to the '/' terminator). Returns false on the 'Z'
    * end-of-data marker. */
  def skimRow(s: PorStream, vars: Vector[PorVar]): Boolean = {
    // a zero-variable loop body would never consume the 'Z' marker and
    // spin forever emitting empty rows — refuse the degenerate file
    require(vars.nonEmpty, "por: file declares no variables")
    var i = 0
    while (i < vars.length) {
      val c = s.readChar()
      if (c == 'Z') {
        require(i == 0, "POR: Z in middle of row")
        return false
      }
      require(c >= 0,
        "por: stream ended without the 'Z' end-of-data marker — file truncated")
      skimCell(s, vars(i).isString, c)
      i += 1
    }
    true
  }

  /** Skip one cell body whose FIRST char the caller already consumed —
    * shared by [[skimRow]]/[[buildIndex]] and the reader's
    * unprojected-cell skim, so the boundary rules stay in one place. */
  def skimCell(s: PorStream, isString: Boolean, first: Int): Unit = {
    if (isString) {
      val len = s.readDoublePeek(first).toInt
      s.skipChars(len)
    } else if (first == '*') {
      val c2 = s.readChar()
      require(c2 == '.', s"POR: expected '.' after '*', got ${c2.toChar}")
    } else {
      var ch = first
      while (ch != '/') {
        require(ch >= 0, "EOF in base-30 number")
        ch = s.readChar()
      }
    }
  }

  /** One sequential cell-boundary pass recording a [[PorCkpt]] every
    * `every` rows (plus the exact row count). Much cheaper than a full
    * decode — no value parsing or String building — and cached by the
    * caller per (file, size, mtime); amortizes across the parallel
    * partition fan-out it enables, the same trade as the compressed-SPSS
    * checkpoint skim. */
  def buildIndex(path: String, every: Long): PorIndex = {
    require(every > 0, s"por index: every must be positive (got $every)")
    val s = new PorStream(path)
    try {
      val meta = parseMeta(s)
      val cps = Vector.newBuilder[PorCkpt]
      var n = 0L
      var more = true
      while (more) {
        if (n % every == 0L)
          cps += PorCkpt(n, s.bytesConsumed, s.linePos, s.pendingCount)
        more = skimRow(s, meta.vars)
        if (more) n += 1
      }
      // drop a trailing checkpoint that coincides with end-of-data
      // (keep the data-start one for an empty file)
      val all = cps.result()
      PorIndex(n, if (n == 0) all else all.filter(_.row < n))
    } finally s.close()
  }
}
