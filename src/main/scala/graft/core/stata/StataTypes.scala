package graft.core.stata

import java.nio.charset.{Charset, StandardCharsets}

/** Stata .dta data model — storage types, per-version layout and missing
  * rules. Format facts follow the public dta specification (dta versions
  * 102–119); behavioral reference: /root/reference crates/polars_readstat_rs
  * /src/stata/{header.rs:20-99, metadata.rs:171-254, value.rs:19-52}.
  */
object StataTypes {

  sealed trait VarType { def width: Int }
  case object TByte extends VarType { val width = 1 }
  case object TInt extends VarType { val width = 2 }
  case object TLong extends VarType { val width = 4 }
  case object TFloat extends VarType { val width = 4 }
  case object TDouble extends VarType { val width = 8 }
  final case class TStr(w: Int) extends VarType { def width: Int = w }
  case object TStrL extends VarType { val width = 8 }

  /** How a column is surfaced after %fmt-driven temporal classification
    * (reference: stata/polars_output.rs:713-780).
    */
  sealed trait OutKind
  case object OByte extends OutKind
  case object OShort extends OutKind
  case object OInt extends OutKind
  case object OFloat extends OutKind
  case object ODouble extends OutKind
  case object OString extends OutKind
  /** Date with a Stata elapsed unit: d=days, w=weeks, m=months, q=quarters,
    * h=half-years since 1960; y=calendar year. All surface as DateType.
    */
  final case class ODate(unit: Char) extends OutKind
  case object ODatetimeMs extends OutKind  // ms since 1970 (shift 3653d in ms)
  case object OTimeNs extends OutKind      // nanos-of-day (LongType + metadata tag)

  /** Stata elapsed date value → days since Unix epoch (1970-01-01),
    * following Stata's documented display-format semantics (and pandas'
    * stata reader): weeks are 52/year anchored at Jan 1, months/quarters/
    * halves are calendar months since 1960-01, %ty holds the calendar year.
    */
  def stataDateToEpochDays(v: Long, unit: Char): Int = {
    import java.time.LocalDate
    val d: LocalDate = unit match {
      case 'd' => return (v - EpochShiftDays).toInt
      case 'w' =>
        val year = 1960 + Math.floorDiv(v, 52)
        val week = Math.floorMod(v, 52)
        LocalDate.of(year.toInt, 1, 1).plusDays(week * 7)
      case 'm' =>
        val year = 1960 + Math.floorDiv(v, 12)
        val month = Math.floorMod(v, 12) + 1
        LocalDate.of(year.toInt, month.toInt, 1)
      case 'q' =>
        val year = 1960 + Math.floorDiv(v, 4)
        val month = Math.floorMod(v, 4) * 3 + 1
        LocalDate.of(year.toInt, month.toInt, 1)
      case 'h' =>
        val year = 1960 + Math.floorDiv(v, 2)
        val month = Math.floorMod(v, 2) * 6 + 1
        LocalDate.of(year.toInt, month.toInt, 1)
      case 'y' => LocalDate.of(v.toInt, 1, 1)
      case _ => return (v - EpochShiftDays).toInt
    }
    d.toEpochDay.toInt
  }

  final case class Variable(
      name: String,
      varType: VarType,
      format: Option[String],
      valueLabelName: Option[String],
      label: Option[String]) {
    def outKind: OutKind = temporalKind(format, varType).getOrElse(varType match {
      case TByte => OByte
      case TInt => OShort
      case TLong => OInt
      case TFloat => OFloat
      case TDouble => ODouble
      case TStr(_) | TStrL => OString
    })
  }

  final case class MissingRules(
      maxInt8: Int, maxInt16: Int, maxInt32: Int,
      sysMissingEnabled: Boolean,
      sysInt8: Int, sysInt16: Int, sysInt32: Int,
      maxFloatBits: Long, maxDoubleBits: Long,
      missFloatBits: Long, missDoubleBits: Long)

  /** Version-dependent missing sentinels (value.rs:19-52). */
  def missingRules(version: Int): MissingRules =
    if (version < 113)
      MissingRules(0x7e, 0x7ffe, 0x7ffffffe, sysMissingEnabled = false, 0, 0, 0,
        0x7effffffL, 0x7fdfffffffffffffL, 0x7f000000L, 0x7fe0000000000000L)
    else
      MissingRules(0x7f, 0x7fff, 0x7fffffff, sysMissingEnabled = true,
        0x65, 0x7fe5, 0x7fffffe5,
        0x7effffffL, 0x7fdfffffffffffffL, 0x7f000000L, 0x7fe0000000000000L)

  /** Classify a Stata display format into a temporal kind: `%t?`/`%-t?`
    * prefixes where ? in {d,w,m,q,h,y} → Date, `c/C` → DateTime (or Time
    * when a sub-day mask like %tcHH:MM:SS is present without date tokens).
    */
  def temporalKind(format: Option[String], varType: VarType): Option[OutKind] = {
    val numericDateOk = varType match {
      case TByte | TInt | TLong | TFloat | TDouble => true
      case _ => false
    }
    val numericDtOk = varType match {
      case TLong | TFloat | TDouble => true
      case _ => false
    }
    val fmt0 = format.map(_.trim).getOrElse(return None)
    if (fmt0.isEmpty || fmt0(0) != '%') return None
    // strip leading %-, %0 etc. alignment/width chars up to the first letter
    val body = fmt0.drop(1).dropWhile(c => c == '-' || c == '0')
    if (body.startsWith("t")) {
      val rest = body.drop(1)
      if (rest.isEmpty) return None
      rest(0) match {
        case 'c' | 'C' =>
          val mask = rest.drop(1)
          if (mask.isEmpty) { if (numericDtOk) Some(ODatetimeMs) else None }
          else if (numericDtOk) {
            // %tc with a display mask: date tokens present → full datetime;
            // pure time-of-day mask (e.g. %tcHH:MM:SS) → Time
            val hasDateTokens = mask.exists(c => "CcYyNnDd".indexOf(c) >= 0)
            if (hasDateTokens) Some(ODatetimeMs) else Some(OTimeNs)
          } else None
        case u @ ('d' | 'w' | 'm' | 'q' | 'h' | 'y') =>
          if (numericDateOk) Some(ODate(u)) else None
        case _ => None
      }
    } else body.headOption match {
      // pre-%t legacy formats: %d.. date masks, %c datetime
      case Some('c') | Some('C') => if (numericDtOk) Some(ODatetimeMs) else None
      case Some('d') => if (numericDateOk) Some(ODate('d')) else None
      case _ => None
    }
  }

  /** Days between 1960-01-01 (Stata epoch) and 1970-01-01 (Unix epoch). */
  val EpochShiftDays: Long = 3653L
  val EpochShiftMs: Long = EpochShiftDays * 86400000L

  def charsetFor(version: Int): Charset =
    if (version >= 118) StandardCharsets.UTF_8
    else Charset.forName("windows-1252")

  final case class ValueLabelTable(name: String, mapping: Map[Int, String])

  final case class Metadata(
      version: Int,
      littleEndian: Boolean,
      nVars: Int,
      nObs: Long,
      dataLabel: Option[String],
      timestamp: Option[String],
      variables: Vector[Variable],
      dataOffset: Long,
      strlsOffset: Long,      // 0 = none
      valueLabelsOffset: Long, // 0 = none
      valueLabels: Vector[ValueLabelTable]) {
    def rowLen: Int = variables.map(_.varType.width).sum
    def charset: Charset = charsetFor(version)
    def rules: MissingRules = missingRules(version)
  }
}
