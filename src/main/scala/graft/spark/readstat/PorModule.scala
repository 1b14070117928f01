package graft.spark.readstat

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.por.PorCore
import graft.core.por.PorCore._

/** SPSS portable (.por) as a Spark format module. The format is a
  * translated ASCII stream with no record boundaries → inherently
  * sequential single-partition scan (SURVEY.md §2.1). Row count is
  * unknown until the 'Z' end marker.
  */
object PorModule extends FormatModule {

  private case class FileKey(path: String, size: Long, mtime: Long)
  private def keyOf(path: String) = {
    val f = new java.io.File(path)
    FileKey(path, f.length(), f.lastModified())
  }
  private val mdCache = new ConcurrentHashMap[FileKey, PorMeta]()
  def metadata(path: String): PorMeta =
    mdCache.computeIfAbsent(keyOf(path), _ => {
      val s = new PorStream(path)
      try PorCore.parseMeta(s) finally s.close()
    })

  def sparkTypeOf(v: PorVar, opts: ReadstatOptions): DataType =
    if (v.isString) StringType
    else v.formatClass match {
      case Some("Date") => DateType
      case Some("DateTime") => TimestampNTZType
      case Some("Time") =>
        // nanos-of-day either way (TIME(6)'s physical long)
        if (opts.timeAsTimeType) org.apache.spark.sql.types.TimeType(6)
        else LongType
      case _ => DoubleType
    }

  override def schema(path: String, opts: ReadstatOptions): StructType = {
    val md = metadata(path)
    val fields = Vector.newBuilder[StructField]
    md.vars.foreach { v =>
      val mb = new MetadataBuilder()
      if (v.formatClass.contains("Time")) mb.putString("readstat.type", "time")
      v.label.foreach(l => mb.putString("readstat.label", l))
      fields += StructField(v.name, sparkTypeOf(v, opts), nullable = true, mb.build())
    }
    opts.rowIndexName.foreach(n => fields += StructField(n, LongType, nullable = false))
    StructType(fields.result())
  }

  override def planPartitions(path: String, opts: ReadstatOptions,
      limit: Option[Long]): Seq[RangePartition] =
    Seq(RangePartition(path, 0, limit.getOrElse(Long.MaxValue)))

  override def rows(part: RangePartition, opts: ReadstatOptions,
      required: StructType): Iterator[InternalRow] = {
    val stream = new PorStream(part.path)
    val md = PorCore.parseMeta(stream) // re-parse to position at data start
    val byName = md.vars.map(_.name).zipWithIndex.toMap
    val plans = required.fields.zipWithIndex.map { case (f, fi) =>
      if (opts.rowIndexName.contains(f.name)) (fi, -1)
      else (fi, byName.getOrElse(f.name,
        throw new IllegalArgumentException(s"no such column: ${f.name}")))
    }

    new Iterator[InternalRow] {
      private var limit = part.numRows
      private var nextRow: Array[Any] = _
      private var done = false

      private def readFullRow(): Array[Any] = {
        val vals = new Array[Any](md.vars.length)
        var i = 0
        while (i < md.vars.length) {
          val v = md.vars(i)
          if (v.isString) {
            stream.maybeString() match {
              case None =>
                require(i == 0, "POR: Z in middle of row")
                return null
              case Some(s0) =>
                var e = s0.length
                while (e > 0 && s0(e - 1) == ' ') e -= 1
                val s = s0.substring(0, e)
                vals(i) =
                  if (s.isEmpty && opts.missingStringAsNull) null
                  else UTF8String.fromString(s)
            }
          } else {
            stream.maybeDouble() match {
              case None =>
                require(i == 0, "POR: Z in middle of row")
                return null
              case Some(d) =>
                vals(i) =
                  if (d.isNaN) null
                  else v.formatClass match {
                    case Some("Date") => ((d.toLong - SecShift) / 86400L).toInt
                    case Some("DateTime") =>
                      math.round((d - SecShift) * 1000.0) * 1000L
                    case Some("Time") => math.round(d * 1e9)
                    case _ => d
                  }
            }
          }
          i += 1
        }
        vals
      }

      override def hasNext: Boolean = {
        if (done) return false
        if (limit <= 0) { done = true; stream.close(); return false }
        if (nextRow == null) {
          // do NOT catch here: a decode error (truncated stream, corrupt
          // base-30 digits) must fail the read, not masquerade as a clean
          // end-of-data — 'Z'/EOF handling lives in readFullRow itself
          nextRow = readFullRow()
          if (nextRow == null) { done = true; stream.close() }
        }
        nextRow != null
      }

      private var rowIdx = 0L
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        val vals = nextRow; nextRow = null; limit -= 1
        val row = new GenericInternalRow(plans.length)
        plans.foreach { case (fi, vi) =>
          row.update(fi, if (vi == -1) rowIdx else vals(vi)) }
        rowIdx += 1
        row
      }
    }
  }
}
