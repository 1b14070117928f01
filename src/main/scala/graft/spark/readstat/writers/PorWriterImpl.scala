package graft.spark.readstat.writers

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.core.por.PorCore

/** SPSS portable (.por) writer. The format is a sequential 80-column
  * text stream with no record boundaries, so the write is driver-side
  * streaming over `toLocalIterator` (one partition at a time is pulled;
  * memory stays bounded). POR is an interchange format for small-to-
  * medium extracts — for 100 TB scale use the binary writers.
  * Behavioral reference: por.rs:843-1010.
  */
object PorWriterImpl {

  /** POR byte emitter. `wrap = true` inserts '\n' every 80 chars (the
    * on-disk transport); `wrap = false` emits the LOGICAL byte stream —
    * position-independent, so executors can encode chunks that the
    * streaming sink's driver commit re-wraps at the resumed line
    * position (`startPos`). */
  private[writers] final class LineWriter(out: java.io.OutputStream,
      wrap: Boolean = true, startPos: Int = 0) {
    private var pos = startPos
    def position: Int = pos
    def byte(b: Int): Unit = {
      out.write(b)
      if (wrap) {
        pos += 1
        if (pos == PorCore.LineLen) { out.write('\n'); pos = 0 }
      }
    }
    def bytes(bs: Array[Byte]): Unit = bs.foreach(b => byte(b & 0xff))
    def str(s: String): Unit = bytes(s.getBytes(StandardCharsets.ISO_8859_1))
    def base30Int(n0: Long): Unit = {
      var n = n0
      if (n == 0) { byte('0'); return }
      val digits = new StringBuilder
      while (n > 0) {
        val d = (n % 30).toInt
        digits.append(if (d < 10) ('0' + d).toChar else ('A' + d - 10).toChar)
        n /= 30
      }
      digits.reverseInPlace().toString.foreach(c => byte(c))
    }
    def double(v: Double): Unit = {
      if (v.isNaN) { byte('*'); byte('.'); return }
      if (v.isInfinite) { if (v < 0) byte('-'); str("1+TT/"); return }
      if (v < 0) byte('-')
      val abs = math.abs(v)
      val intPart = abs.toLong
      var frac = abs - intPart
      var exponent = 0L
      var ip = intPart
      if (ip == 0) byte('0')
      else {
        while (frac == 0.0 && ip != 0 && ip % 30 == 0) { ip /= 30; exponent += 1 }
        base30Int(ip)
      }
      if (frac != 0.0) {
        byte('.')
        var printed = { var n = intPart; var c = if (n == 0) 1 else 0
          while (n > 0) { n /= 30; c += 1 }; c }
        while (frac != 0.0 && printed < 50) {
          frac *= 30.0
          val d = frac.toLong
          frac -= d
          byte(if (d < 10) ('0' + d).toInt else ('A' + d - 10).toInt)
          printed += 1
        }
      }
      if (exponent > 0) { byte('+'); base30Int(exponent) }
      byte('/')
    }
    def stringField(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.ISO_8859_1)
      base30Int(b.length.toLong); byte('/'); bytes(b)
    }
    def finishWithZ(): Unit = {
      if (pos != 0) { while (pos != 0) byte('Z') }
    }
  }

  /** SPSS numeric format name → POR format-type code (PorVar.formatClass
    * inverse: 21|25 Time, 20|23|24 Date, 22 DateTime, 5 plain F). */
  private val FmtCodes = Map("F" -> 5, "TIME" -> 21, "DTIME" -> 25,
    "DATE" -> 20, "ADATE" -> 23, "JDATE" -> 24, "DATETIME" -> 22)
  private val FmtDefaultWidth = Map(5 -> 8, 21 -> 8, 25 -> 12, 20 -> 11,
    23 -> 11, 24 -> 7, 22 -> 20)
  private val FmtRe = "^([A-Z]+)(\\d*)(?:\\.(\\d+))?$".r

  private def parseNumFormat(col: String, raw: String): (Int, Int, Int) =
    raw.trim.toUpperCase match {
      case FmtRe(name, w, d) if FmtCodes.contains(name) =>
        val code = FmtCodes(name)
        (code,
          if (w.isEmpty) FmtDefaultWidth(code) else w.toInt,
          if (d == null || d.isEmpty) 0 else d.toInt)
      case _ => throw new IllegalArgumentException(
        s"por writer: varFormats.$col format '$raw' is not a supported " +
          "POR numeric format (" + FmtCodes.keys.toSeq.sorted.mkString("|") +
          " with optional width[.dec])")
    }

  private[writers] final case class PorOpts(
      varLabels: Map[String, String],
      fileLabel: String,
      varFormats: Map[String, (Int, Int, Int)],
      valueLabels: Map[String, Seq[(String, String)]],
      missingValues: Map[String, SpssSavWriter.MissSpec])

  /** Parse + validate every header-shaping option against a schema —
    * shared by the batch writer and the streaming sink.
    *
    * Reference PorWriteOptions parity: file_label (vanity row 1, 20
    * chars) + variable_labels (tag-'C' records after each variable).
    * valueLabels / missingValues are BEYOND the reference (write_por
    * takes neither): numeric and string label sets land as tag-'D'
    * records, user-missing declarations as tag-8/B records, both read
    * back by our reader's label/missing surface.
    *
    * metadata-df-driven options (reference `metadata=` write path):
    * entries for absent or POR-unrepresentable variables are DROPPED —
    * the dta writer's silent-narrowing rule — while the explicit
    * options stay strict and always win on conflict. */
  private[writers] def parsePorOptions(
      schema: org.apache.spark.sql.types.StructType,
      options: Map[String, String],
      metaOpts: Option[MetadataDfOptions]): PorOpts = {
    // a zero-variable .por has no row framing — its reader would loop;
    // refuse at write time like the sas7bdat writer
    require(schema.nonEmpty, "por writer: empty schema")
    val colSet = schema.fieldNames.toSet
    // POR carries uppercased ≤8-char names, so metadata read back from a
    // .por names variables in caps — match case-insensitively like the
    // xpt writer (exact match wins when both exist)
    val colByUpper: Map[String, String] =
      schema.fieldNames.groupBy(_.toUpperCase).collect {
        case (u, arr) if arr.length == 1 => u -> arr(0)
      }
    def metaFil[T](m: MetadataDfOptions => Map[String, T]): Map[String, T] =
      metaOpts.map { o =>
        m(o).flatMap { case (k, v) =>
          if (colSet(k)) Some(k -> v)
          else colByUpper.get(k.toUpperCase).map(_ -> v)
        }
      }.getOrElse(Map.empty)
    def asciiOk(s: String, cap: Int): Boolean =
      s.length <= cap && s.forall(ch => ch >= 0x20 && ch <= 0x7E)
    def plainNumeric(c: String): Boolean = schema(c).dataType match {
      case StringType | DateType | TimestampType | TimestampNTZType => false
      case _: TimeType => false
      case _ => true
    }
    val metaValLabels: Map[String, Seq[(String, String)]] =
      metaFil(_.valLabels).flatMap { case (c, pairs) =>
        val isStr = schema(c).dataType == StringType
        if (!isStr && !plainNumeric(c)) None
        else {
          val ok = pairs.filter { case (code, l) =>
            asciiOk(l, 60) && asciiOk(code, 255) && (isStr ||
              (try { code.toDouble; true }
              catch { case _: NumberFormatException => false }))
          }
          if (ok.isEmpty) None else Some(c -> ok)
        }
      }
    val metaVarLabels = metaFil(_.varLabels).filter(kv => asciiOk(kv._2, 255))
    val metaVarFormats = metaFil(_.formatTriples).filter(kv => plainNumeric(kv._1))

    val valueLabels: Map[String, Seq[(String, String)]] =
      SasCsvBundleWriter.parseAnyValueLabels(options.getOrElse("valueLabels", ""))
    val unknownVl = valueLabels.keySet.diff(schema.fieldNames.toSet)
    require(unknownVl.isEmpty,
      s"por writer: valueLabels names unknown column(s): ${unknownVl.mkString(", ")}")
    valueLabels.foreach { case (c, pairs) =>
      schema(c).dataType match {
        case DateType | TimestampType | TimestampNTZType | _: TimeType =>
          throw new IllegalArgumentException(
            s"por writer: valueLabels.$c targets a temporal column — " +
              "value labels apply to plain numeric and string columns")
        case StringType => ()
        case _ => pairs.foreach { case (code, _) =>
          require(code.nonEmpty &&
              (try { code.toDouble; true }
              catch { case _: NumberFormatException => false }),
            s"por writer: valueLabels.$c code '$code' is not numeric " +
              "for a numeric column")
        }
      }
      pairs.foreach { case (code, l) =>
        // POR is printable-ASCII only; 60 chars is the SPSS value-label cap
        require(l.length <= 60 && l.forall(ch => ch >= 0x20 && ch <= 0x7E),
          s"por writer: valueLabels.$c label for code '$code' must be at " +
            "most 60 printable-ASCII characters (POR is an ASCII-only format)")
        require(code.forall(ch => ch >= 0x20 && ch <= 0x7E),
          s"por writer: valueLabels.$c code '$code' must be printable ASCII")
      }
    }
    // declared user-missing values (BEYOND the reference, same spec
    // grammar as the sav writer): numeric → tag-'8' discretes / tag-'B'
    // range; string → tag-'8' discretes only
    val missingValues: Map[String, SpssSavWriter.MissSpec] =
      SpssSavWriter.parseMissingValues(options.getOrElse("missingValues", ""))
    val unknownMv = missingValues.keySet.diff(schema.fieldNames.toSet)
    require(unknownMv.isEmpty,
      s"por writer: missingValues names unknown column(s): ${unknownMv.mkString(", ")}")
    missingValues.foreach { case (c, spec) =>
      schema(c).dataType match {
        case DateType | TimestampType | TimestampNTZType | _: TimeType =>
          throw new IllegalArgumentException(
            s"por writer: missingValues.$c targets a temporal column — " +
              "missing declarations apply to plain numeric and string columns")
        case StringType =>
          require(spec.range.isEmpty,
            s"por writer: missingValues.$c declares a numeric range on a " +
              "string column — string missings are discrete only")
          spec.discrete.foreach(v =>
            require(v.forall(ch => ch >= 0x20 && ch <= 0x7E),
              s"por writer: missingValues.$c value '$v' must be printable ASCII"))
        case _ => spec.discrete.foreach { v =>
          require(try { v.toDouble; true }
            catch { case _: NumberFormatException => false },
            s"por writer: missingValues.$c value '$v' is not numeric " +
              "for a numeric column")
        }
      }
    }
    val varLabels = StataDtaWriter.parseVarLabels(
      options.getOrElse("varLabels", ""))
    val unknown = varLabels.keySet.diff(schema.fieldNames.toSet)
    require(unknown.isEmpty,
      s"por writer: varLabels names unknown column(s): ${unknown.mkString(", ")}")
    // POR is a printable-ASCII format: reject (don't corrupt) labels the
    // encoding cannot carry, same loudness as the xpt writer's Latin-1
    // check; 255 is the SPSS variable-label cap
    varLabels.foreach { case (c, l) =>
      require(l.length <= 255 && l.forall(ch => ch >= 0x20 && ch <= 0x7E),
        s"por writer: varLabels.$c must be at most 255 printable-ASCII " +
          "characters (POR is an ASCII-only format)")
    }
    val fileLabel = options.getOrElse("fileLabel", "")
    require(fileLabel.length <= 20 &&
        fileLabel.forall(ch => ch >= 0x20 && ch <= 0x7E),
      "por writer: fileLabel must be at most 20 printable-ASCII characters")
    // declared numeric display formats (SPSS format names, declare-only
    // like the sas/xpt writers' varFormats): the stored value is still
    // the raw double — TIME declares seconds-of-day, DATE/DATETIME
    // declare SPSS-epoch seconds — and the READ side maps the class
    val varFormats: Map[String, (Int, Int, Int)] =
      StataDtaWriter.parseVarLabels(options.getOrElse("varFormats", ""))
        .map { case (c, raw) =>
          require(schema.fieldNames.contains(c),
            s"por writer: varFormats names unknown column '$c'")
          schema(c).dataType match {
            case StringType | DateType | TimestampType | TimestampNTZType =>
              throw new IllegalArgumentException(
                s"por writer: varFormats.$c targets a " +
                  s"${schema(c).dataType.simpleString} column — formats " +
                  "apply to plain numeric columns (temporal columns " +
                  "declare their class automatically)")
            case _: TimeType => throw new IllegalArgumentException(
              s"por writer: varFormats.$c targets a time column — TIME " +
                "columns declare their class automatically")
            case _ => ()
          }
          c -> parseNumFormat(c, raw)
        }
    // metadata-df entries seed; explicit options override per column
    PorOpts(
      varLabels = metaVarLabels ++ varLabels,
      fileLabel = fileLabel,
      varFormats = metaVarFormats ++ varFormats,
      valueLabels = metaValLabels ++ valueLabels,
      missingValues = missingValues)
  }

  def write(df: DataFrame, path: String, options: Map[String, String]): Unit = {
    val o = parsePorOptions(df.schema, options,
      options.get("metadataPath")
        .map(p => MetadataDfOptions.read(df.sparkSession, p)))
    // ---- multiFile mode: one self-contained .por per partition ----
    // POR is an inherently sequential text stream, so the single-file
    // write streams through the driver; multiFile moves the whole encode
    // (not just a splice) onto executors — the only parallel write path
    // the format admits.
    // InternalRow throughout: Spark 4.1 still gates TIME in the Row
    // encoder (UNSUPPORTED_TIME_TYPE from toLocalIterator/df.rdd), and
    // toRdd also skips the external-type conversion for every column
    if (options.get("multiFile").exists(_.toBoolean)) {
      val partPrefix = MultiFileParts.prepare(new java.io.File(path), "por", options)
      val schema = df.schema
      df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          writeOne(s"$path/$partPrefix" + f"$pid%05d.por", schema, it, o)
          Iterator(1)
        }
      }.count()
      return
    }
    // .copy() is load-bearing: toLocalIterator materializes each
    // partition into an array, and scan iterators REUSE their row
    // object — without the copy every buffered element aliases the
    // partition's last row. (The multiFile path above streams rows
    // one-at-a-time inside mapPartitions, where reuse is safe.)
    writeOne(path, df.schema,
      df.queryExecution.toRdd.map(_.copy()).toLocalIterator, o)
  }


  /** Emit the full pre-data section (vanity block through the 'F' tag):
    * shared by the batch writer and the streaming sink, whose header is
    * CONSTANT for a given (schema, options) — POR stores no row count,
    * which is exactly what makes epoch-append streaming possible. */
  private[writers] def writeHeader(w: LineWriter,
      schema: org.apache.spark.sql.types.StructType, o: PorOpts): Unit = {

      // vanity block (5×40) with the standard row-1 banner
      val vanity = Array.fill[Byte](200)('0')
      val banner = "ASCII SPSS PORT FILE".getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(banner, 0, vanity, 40, banner.length)
      java.util.Arrays.fill(vanity, 60, 80, ' '.toByte)
      val flb = o.fileLabel.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(flb, 0, vanity, 60, math.min(flb.length, 20))
      w.bytes(vanity)
      // identity character table
      val lookup = Array.fill[Byte](256)('0')
      for (i <- 0 until 256)
        if (PorCore.PorAsciiLookup(i) != 0) lookup(i) = PorCore.PorAsciiLookup(i)
      w.bytes(lookup)
      w.str("SPSSPORT")
      w.byte('A')
      w.stringField("20260101"); w.stringField("000000")
      w.byte('1'); w.stringField("polars_readstatspark")
      w.byte('4'); w.base30Int(schema.length.toLong); w.byte('/')
      w.byte('5'); w.base30Int(16L); w.byte('/')

      // variable records (names: uppercase, ≤8 chars, deduped)
      val used = scala.collection.mutable.Set[String]()
      val specs = schema.fields.map { f =>
        var s = f.name.toUpperCase.filter(c => c.isLetterOrDigit || c == '_').take(8)
        if (s.isEmpty || !s(0).isLetter) s = ("V" + s).take(8)
        var cand = s; var i = 1
        while (!used.add(cand)) { val t = i.toString; cand = s.take(8 - t.length) + t; i += 1 }
        (f, cand)
      }
      // string widths must fit the declared width — POR strings carry
      // explicit lengths so declare 255
      specs.foreach { case (f, short) =>
        val (width, fmtType, fmtW, fmtD) = f.dataType match {
          case StringType => (255, 1, 255, 0)
          case DateType => (0, 20, 11, 0)
          case TimestampType | TimestampNTZType => (0, 22, 20, 0)
          case _: TimeType => (0, 21, 8, 0) // TIME8, seconds-of-day
          case _ => o.varFormats.get(f.name) match {
            case Some((t, fw, fd)) => (0, t, fw, fd)
            case None => (0, 5, 8, 0)
          }
        }
        w.byte('7')
        w.double(width.toDouble)
        w.stringField(short)
        w.double(fmtType.toDouble); w.double(fmtW.toDouble); w.double(fmtD.toDouble)
        w.double(fmtType.toDouble); w.double(fmtW.toDouble); w.double(fmtD.toDouble)
        // missing declarations attach to the LAST variable record, so
        // they must land here, before the next tag-'7'
        o.missingValues.get(f.name).foreach { spec =>
          spec.range.foreach { case (lo, hi) =>
            w.byte('B'); w.double(lo); w.double(hi)
          }
          spec.discrete.foreach { v =>
            w.byte('8')
            if (f.dataType == StringType) w.stringField(v)
            else w.double(v.toDouble)
          }
        }
        o.varLabels.get(f.name).foreach { lbl =>
          w.byte('C'); w.stringField(lbl)
        }
      }
      // tag-'D' value-label sets (one per labeled column, keyed by the
      // short on-file name), after all variable records per the portable
      // layout; string columns carry string codes, numeric ones base-30
      specs.foreach { case (f, short) =>
        o.valueLabels.get(f.name).filter(_.nonEmpty).foreach { pairs =>
          w.byte('D'); w.base30Int(1L); w.byte('/')
          w.stringField(short)
          w.base30Int(pairs.length.toLong); w.byte('/')
          val isStr = f.dataType == StringType
          pairs.foreach { case (code, label) =>
            if (isStr) w.stringField(code) else w.double(code.toDouble)
            w.stringField(label)
          }
        }
      }
      w.byte('F')
  }

  /** Emit via a same-directory temp + atomic rename (no partial files
    * at the final name). */
  private def writeOne(path: String,
      schema: org.apache.spark.sql.types.StructType,
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      o: PorOpts): Unit =
    AtomicFile.write(path)(tmp => writeOneRaw(tmp, schema, rows, o))

  private def writeOneRaw(path: String,
      schema: org.apache.spark.sql.types.StructType,
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      o: PorOpts): Unit = {
    val outPath = Paths.get(path)
    Option(outPath.getParent).foreach(Files.createDirectories(_))
    val os = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    val w = new LineWriter(os)
    try {
      writeHeader(w, schema, o)

      // data (single row stream; see scaladoc)
      val fields = schema.fields
      rows.foreach(row => encodeRow(w, fields, row))
      w.byte('Z')
      w.finishWithZ()
    } finally os.close()
  }

  /** Encode one row's cells (shared by the batch writer and the
    * streaming sink's executor chunk encoders). InternalRow physical
    * forms: Date = days since 1970 (int), Timestamp/NTZ = micros since
    * epoch (long; NTZ identical under the session UTC timezone),
    * Time = nanos-of-day (long). */
  private[writers] def encodeRow(w: LineWriter, fields: Array[StructField],
      row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
    var i = 0
    while (i < fields.length) {
      fields(i).dataType match {
        case StringType =>
          w.stringField(
            if (row.isNullAt(i)) "" else row.getUTF8String(i).toString)
        case DateType =>
          if (row.isNullAt(i)) w.double(Double.NaN)
          else w.double(row.getInt(i).toDouble * 86400 + PorCore.SecShift)
        case TimestampType | TimestampNTZType =>
          if (row.isNullAt(i)) w.double(Double.NaN)
          else w.double(row.getLong(i) / 1000000.0 + PorCore.SecShift)
        case _: TimeType =>
          if (row.isNullAt(i)) w.double(Double.NaN)
          else w.double(row.getLong(i) / 1e9)
        case dt =>
          if (row.isNullAt(i)) w.double(Double.NaN)
          else {
            val d = dt match {
              case ByteType => row.getByte(i).toDouble
              case ShortType => row.getShort(i).toDouble
              case IntegerType => row.getInt(i).toDouble
              case LongType => row.getLong(i).toDouble
              case FloatType => row.getFloat(i).toDouble
              case BooleanType => if (row.getBoolean(i)) 1.0 else 0.0
              case dec: DecimalType =>
                row.getDecimal(i, dec.precision, dec.scale).toDouble
              case _ => row.getDouble(i)
            }
            w.double(d)
          }
      }
      i += 1
    }
  }
}
