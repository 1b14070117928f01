package graft.spark.readstat.writers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Write-side type compression — the Spark analog of the reference
  * writer's `with_compress` / `compress_df` pre-pass (reference:
  * crates/polars_readstat_rs/src/stata/writer.rs:185-230,
  * src/stata/compress.rs:82-202): before encoding, downcast each column
  * to the narrowest type that holds every value, so a user writing f64
  * columns that happen to hold small integers gets compact int storage
  * in one call instead of pre-casting by hand.
  *
  * Semantics per column (reference `CompressOptions` defaults):
  *  - float32/64 whose every non-null value is integral → Boolean when
  *    all values ∈ {0, 1} (unless `compressNoBoolean`), else the
  *    narrowest of int8/int16/int32 whose bounds fit min/max, else
  *    float64;
  *  - integer/boolean columns re-narrow the same way (an int64 whose
  *    values exceed int32 bounds becomes float64, like the reference);
  *  - timestamp columns whose every value is midnight → date
  *    (`compressCheckDateTime`, default on);
  *  - all-null columns → Boolean (`compressAllNullToBoolean`, default on);
  *  - string columns that fully parse as numbers → float64
  *    (`compressCheckString`, default OFF like the reference), then the
  *    parsed values re-enter the numeric narrowing;
  *  - `compressCols` restricts the pass to a named subset.
  *
  * Bounds: for .dta targets the Stata missing-sentinel-aware bounds
  * apply by default (int8 ≤ 100, int16 ≤ 32740, int32 ≤ 2147483620 —
  * reference writer.rs:25-39); other formats use the full two's-
  * complement ranges. Override with `compressStataBounds`.
  *
  * Scale shape — and the one deliberate divergence from the reference:
  * the reference probes a materialized local frame; here the stats come
  * from ONE distributed aggregate job over the outgoing DataFrame
  * (min/max/integrality per column, all map-side combinable), so the
  * narrowing is EXACT over every row — no probe-undersampling failure
  * mode, no strict-cast surprise in a later partition — and the frame
  * itself never lands anywhere. One extra pass over data that is about
  * to be written once is the right trade for a deterministic schema.
  */
object WriteCompress {

  /** Stata missing-value-aware integer bounds (reference writer.rs:25-39:
    * values above these encode missing sentinels). */
  private val StataBounds = ((-127L, 100L), (-32767L, 32740L),
    (-2147483647L, 2147483620L))
  private val StandardBounds = ((Byte.MinValue.toLong, Byte.MaxValue.toLong),
    (Short.MinValue.toLong, Short.MaxValue.toLong),
    (Int.MinValue.toLong, Int.MaxValue.toLong))

  case class Opts(cols: Option[Set[String]], noBoolean: Boolean,
      stataBounds: Boolean, checkString: Boolean, checkDateTime: Boolean,
      allNullToBoolean: Boolean)

  object Opts {
    def from(options: Map[String, String], isDta: Boolean): Opts = Opts(
      cols = options.get("compressCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet),
      noBoolean = options.get("compressNoBoolean").exists(_.toBoolean),
      stataBounds = options.get("compressStataBounds")
        .map(_.toBoolean).getOrElse(isDta),
      checkString = options.get("compressCheckString").exists(_.toBoolean),
      checkDateTime = options.get("compressCheckDateTime")
        .forall(_.toBoolean),
      allNullToBoolean = options.get("compressAllNullToBoolean")
        .forall(_.toBoolean))
  }

  /** The reference's `try_parse_string_to_f64` view: empty → null, else
    * a non-throwing numeric parse (compress.rs:150-170). Every consumer
    * of a checkString column — stats, null count, and the final cast —
    * goes through THIS expression, never the raw string. */
  private def parsedString(name: String): Column =
    when(length(trim(col(name))) === 0, lit(null))
      .otherwise(trim(col(name)).try_cast(DoubleType))

  private val MillisPerDay = 86400000L

  def apply(df: DataFrame, opts: Opts): DataFrame = applyWithStats(df, opts)._1

  /** r15: the compress stats job now ALSO measures row count,
    * max-octet-width of every string column, and min/max of every
    * integer-width output column, and hands them to the writer — before
    * this, a compress write ran THREE full passes over the outgoing
    * data (compress stats, writer width/count/range agg, encode); the
    * writer skips its own stats job when these cover its needs (guide
    * §1.2: remove whole passes before tuning anything inside one).
    * Width entries are for the string columns that SURVIVE narrowing (a
    * narrowed column's width is meaningless); an all-null surviving
    * string reports width 0 and the writers floor at 1 exactly as they
    * did reading a null max. */
  def applyWithStats(df: DataFrame, opts: Opts):
      (DataFrame, Option[(Long, Map[String, Int], Map[String, (Long, Long)])]) = {
    val targeted = df.schema.fields.filter(f => opts.cols.forall(_(f.name)))

    // the numeric view of each column that participates in narrowing:
    // floats/ints as themselves; strings only under checkString, parsed
    // (empty → null, like the reference's try_parse)
    def numericView(f: StructField): Option[Column] = f.dataType match {
      case DoubleType | FloatType | ByteType | ShortType | IntegerType |
           LongType => Some(col(f.name))
      case BooleanType => Some(col(f.name).cast(IntegerType))
      case StringType if opts.checkString => Some(parsedString(f.name))
      case _ => None
    }

    def isTemporal(f: StructField): Boolean = f.dataType match {
      case TimestampType | TimestampNTZType => opts.checkDateTime
      case _ => false
    }

    // ---- one aggregate job: per-column (count, integral?, min, max, …)
    val aggExprs = targeted.zipWithIndex.flatMap { case (f, i) =>
      // checkString columns count the PARSED view, not the raw column:
      // the reference applies its all-null rule AFTER parsing, so a
      // column of empty strings is all-null → boolean, never numeric
      val base = Seq((f.dataType match {
        case StringType if opts.checkString => count(parsedString(f.name))
        case _ => count(col(f.name))
      }).as(s"c$i"))
      val num = numericView(f).toSeq.flatMap { v =>
        val d = v.cast(DoubleType)
        Seq(
          // NaN/±Inf are never integral; round(double) is rint
          coalesce(bool_and(!isnan(d) && abs(d) =!= lit(Double.PositiveInfinity)
            && d === round(d)), lit(true)).as(s"i$i"),
          min(d).as(s"mn$i"), max(d).as(s"mx$i")) ++
          (if (f.dataType == StringType)
            // a single unparseable non-empty string vetoes the column
            Seq(coalesce(bool_and(
              length(trim(col(f.name))) === 0 ||
                trim(col(f.name)).try_cast(DoubleType).isNotNull),
              lit(true)).as(s"p$i"))
          else Nil)
      }
      // midnight check: zoned timestamps use epoch millis % 86400000 == 0
      // (UTC), exactly the reference's physical check — date_trunc("DAY")
      // on TimestampType would make the narrowing depend on
      // spark.sql.session.timeZone. NTZ has no zone, so wall-clock
      // midnight (date_trunc) IS the stable semantic there.
      val temporal = f.dataType match {
        case TimestampType if opts.checkDateTime =>
          Seq(coalesce(bool_and(
            pmod(unix_millis(col(f.name)), lit(MillisPerDay)) === lit(0L)),
            lit(true)).as(s"m$i"))
        case TimestampNTZType if opts.checkDateTime =>
          Seq(coalesce(bool_and(
            col(f.name) === date_trunc("DAY", col(f.name))), lit(true))
            .as(s"m$i"))
        case _ => Nil
      }
      base ++ num ++ temporal
    }
    if (aggExprs.isEmpty) return (df, None)
    // piggy-backed writer stats: every string column's max octet width
    // (TIME columns never reach here as strings; null max → 0 → writer
    // floors at 1). Computed for ALL strings, filtered to survivors below.
    val allStrCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    val widthExprs = allStrCols.map(c =>
      coalesce(max(octet_length(col(c))), lit(0)).as(s"__w_$c"))
    // __total guards the all-null → Boolean rule: the reference applies
    // it only to frames with rows (compress.rs:123 `s.len() > 0`)
    val withTotal = count(lit(1)).as("__total") +: (aggExprs ++ widthExprs)
    val stats = df.agg(withTotal.head, withTotal.tail: _*).collect()(0)
    val totalRows = stats.getAs[Long]("__total")

    val ((b8lo, b8hi), (b16lo, b16hi), (b32lo, b32hi)) =
      if (opts.stataBounds) StataBounds else StandardBounds

    def narrowType(i: Int, f: StructField): DataType = {
      val cnt = stats.getAs[Long](s"c$i")
      def allNull: DataType =
        if (opts.allNullToBoolean && totalRows > 0L) BooleanType
        else f.dataType
      def numericTarget(asFloat64: DataType): DataType = {
        val integral = stats.getAs[Boolean](s"i$i")
        if (!integral) return f.dataType
        val mn = stats.getAs[Double](s"mn$i")
        val mx = stats.getAs[Double](s"mx$i")
        if (!opts.noBoolean && mn >= 0.0 && mx <= 1.0) BooleanType
        else if (mn >= b8lo && mx <= b8hi) ByteType
        else if (mn >= b16lo && mx <= b16hi) ShortType
        else if (mn >= b32lo && mx <= b32hi) IntegerType
        else asFloat64
      }
      f.dataType match {
        case StringType if opts.checkString =>
          // reference ordering (compress.rs): parse → all-null → numeric.
          // An unparseable value vetoes the whole column FIRST; cnt is
          // the post-parse count, so all-empty columns take the
          // all-null rule instead of unboxing null stats to 0.0.
          if (!stats.getAs[Boolean](s"p$i")) f.dataType
          else if (cnt == 0L) allNull
          else {
            // parseable strings become f64 even when non-integral
            val t = numericTarget(DoubleType)
            if (t == StringType) DoubleType else t
          }
        case _ if cnt == 0L => allNull
        case DoubleType | FloatType => numericTarget(DoubleType)
        case ByteType | ShortType | IntegerType | LongType | BooleanType =>
          numericTarget(DoubleType)
        case TimestampType | TimestampNTZType if isTemporal(f) &&
            stats.getAs[Boolean](s"m$i") => DateType
        case other => other
      }
    }

    val idx = targeted.map(_.name).zipWithIndex.toMap
    val outCols = df.schema.fields.map { f =>
      idx.get(f.name) match {
        case Some(i) =>
          val to = narrowType(i, f)
          if (to == f.dataType) col(f.name)
          else f.dataType match {
            case _ if stats.getAs[Long](s"c$i") == 0L =>
              // all-null narrowing (→ boolean by default): every value is
              // null by construction, so emit typed nulls directly — a
              // raw cast(timestamp AS boolean) would throw DATATYPE_
              // MISMATCH under ANSI even though no value is ever cast
              lit(null).cast(to).as(f.name)
            case StringType =>
              // parsed-string path for EVERY numeric target, boolean
              // included: a raw cast('' / '1.0' as boolean) throws
              // under ANSI where the reference's parse-then-cast works
              parsedString(f.name).cast(to).as(f.name)
            case TimestampType if to == DateType =>
              // UTC-day extraction matching the midnight check above;
              // a plain cast(ts as date) would re-introduce the
              // session-timezone dependence. Division is exact: the
              // check guarantees millis is a multiple of 86400000.
              date_from_unix_date(floor(unix_millis(col(f.name)) /
                lit(MillisPerDay.toDouble)).cast(IntegerType)).as(f.name)
            case _ => col(f.name).cast(to).as(f.name)
          }
        case None => col(f.name)
      }
    }
    val out = df.select(outCols.toIndexedSeq: _*)
    val survivingWidths: Map[String, Int] = out.schema.fields
      .filter(_.dataType == StringType).map(_.name)
      .filter(allStrCols.contains)
      .map(c => c -> stats.getAs[Int](s"__w_$c")).toMap
    // integer value ranges for the dta writer's storage-type widening:
    // every targeted column whose OUTPUT type is an integer width and
    // whose min/max the stats job measured (values are integral by the
    // narrowing proof, so the double → long conversion is exact; date
    // columns are never covered — their stored-value shift lives in the
    // writer — and force the writer's own stats pass)
    val intRanges: Map[String, (Long, Long)] = out.schema.fields.flatMap { f =>
      idx.get(f.name).flatMap { i =>
        f.dataType match {
          case ByteType | ShortType | IntegerType
              if numericView(targeted(i)).isDefined &&
                stats.getAs[Long](s"c$i") > 0L &&
                !stats.isNullAt(stats.fieldIndex(s"mn$i")) =>
            Some(f.name -> (stats.getAs[Double](s"mn$i").toLong,
              stats.getAs[Double](s"mx$i").toLong))
          case _ => None
        }
      }
    }.toMap
    (out, Some((totalRows, survivingWidths, intRanges)))
  }
}
