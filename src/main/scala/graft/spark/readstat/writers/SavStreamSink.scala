package graft.spark.readstat.writers

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** SINGLE-FILE streaming .sav sink — BEYOND the reference (its streaming
  * sink is Stata-only, pybindings.rs:951-1096); included because
  * uncompressed sav is the ideal append format: a constant-length
  * dictionary whose only row-dependent field is `ncases`, then fixed
  * 8-byte-slot records straight to EOF with NO trailer. An epoch commit
  * rewrites the dictionary with the new case count, splices the new
  * chunks at the record boundary, truncates, and fsyncs — the file is a
  * complete valid .sav between commits.
  *
  * Same contract as [[StataStreamSink]]: declared string widths
  * (`strWidth.<col>` / `defaultStrWidth`, over-width strings fail
  * loudly), exactly-once across restarts via the sidecar epoch state,
  * crash-healing by re-truncation. zsav is refused: deflate blocks plus
  * a block-count ztrailer make in-place append a rewrite-the-world
  * operation, which is what multiFile is for.
  */
object SavStreamSink {

  import SpssSavWriter.{ColSpec, WNum, WStr}

  private[writers] def streamColSpecs(schema: StructType,
      options: Map[String, String]): Array[ColSpec] = {
    val defaultW = options.get("defaultStrWidth").map(_.toInt).getOrElse(256)
    require(defaultW >= 1 && defaultW <= 32767,
      "defaultStrWidth must be in [1, 32767] for sav")
    schema.fields.zipWithIndex.map { case (f, i) =>
      val short = s"V${i + 1}"
      f.dataType match {
        case StringType =>
          val dw = options.get(s"strWidth.${f.name}").map(_.toInt)
            .getOrElse(defaultW)
          require(dw >= 1 && dw <= 32767,
            s"strWidth.${f.name} must be in [1, 32767] (sav very-long-string segments)")
          ColSpec(f.name, short, WStr(dw), 1, math.min(dw, 255), 0, f.dataType)
        case DateType => ColSpec(f.name, short, WNum, 20, 11, 0, f.dataType)
        case TimestampType | TimestampNTZType =>
          ColSpec(f.name, short, WNum, 22, 20, 0, f.dataType)
        case ByteType | ShortType | IntegerType | LongType | BooleanType =>
          ColSpec(f.name, short, WNum, 5, 8, 0, f.dataType)
        case FloatType | DoubleType | _: DecimalType =>
          ColSpec(f.name, short, WNum, 5, 8, 2, f.dataType)
        case other => throw new IllegalArgumentException(
          s"sav streaming sink: unsupported type $other for ${f.name}")
      }
    }
  }

  def commitEpoch(path: String, epochId: Long,
      chunks: Seq[(Int, String, Long)], schema: StructType,
      options: Map[String, String]): Unit = synchronized {
    val cols = streamColSpecs(schema, options)
    val recordLen = cols.map(_.widthUnits).sum * 8
    val valueLabels = StataDtaWriter.parseValueLabels(
      options.getOrElse("valueLabels", ""))
    val state = StataStreamSink.readState(path)
    try {
      state match {
        case Some(st) if epochId <= st.epoch => return
        case Some(st) => require(st.rowLen == recordLen,
          s"sav streaming sink: schema drift — committed recordLen " +
            s"${st.rowLen} vs current $recordLen for $path")
        case None => ()
      }
      val prevRows = state.map(_.rows).getOrElse(0L)
      val total = prevRows + chunks.map(_._3).sum
      val dict = SpssSavWriter.buildDictionary(cols, total, zlib = false,
        valueLabels)
      val p = Paths.get(path)
      Option(p.getParent).foreach(Files.createDirectories(_))
      val ch = FileChannel.open(p, StandardOpenOption.CREATE,
        StandardOpenOption.WRITE)
      try {
        ch.position(0L)
        ch.write(ByteBuffer.wrap(dict))
        ch.position(dict.length + prevRows * recordLen)
        chunks.sortBy(_._1).foreach { case (_, f, _) =>
          val in = FileChannel.open(Paths.get(f), StandardOpenOption.READ)
          try { var pos = 0L; val n = in.size()
            while (pos < n) pos += in.transferTo(pos, n - pos, ch)
          } finally in.close()
        }
        require(ch.position() == dict.length + total * recordLen,
          s"sav streaming sink: chunk byte drift at epoch $epochId")
        ch.truncate(ch.position())
        ch.force(true)
      } finally ch.close()
      StataStreamSink.writeState(path,
        StataStreamSink.StreamState(epochId, total, recordLen))
    } finally chunks.foreach { case (_, f, _) => new File(f).delete() }
  }
}

class SavStreamingWrite(path: String, schema: StructType,
    options: Map[String, String]) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new SavStreamWriterFactory(schema, options)
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    SavStreamSink.commitEpoch(path, epochId,
      messages.collect { case m: StataChunkMessage => (m.pid, m.file, m.rows) },
      schema, options)
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: StataChunkMessage => new File(m.file).delete()
      case _ => ()
    }
}

class SavStreamWriterFactory(schema: StructType,
    options: Map[String, String]) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new SavChunkWriter(schema, options, partitionId)
}

class SavChunkWriter(schema: StructType, options: Map[String, String],
    pid: Int) extends DataWriter[InternalRow] {
  private val cols = SavStreamSink.streamColSpecs(schema, options)
  private val scratch = options.getOrElse("scratchDir",
    sys.props.getOrElse("java.io.tmpdir", "/tmp"))
  private val chunk = File.createTempFile(s"graft_ssav_${pid}_", ".chunk",
    new File(scratch))
  private val out = new BufferedOutputStream(new FileOutputStream(chunk), 1 << 20)
  private val enc = new SpssSavWriter.SavRowEncoder(cols)
  private var rows = 0L
  private val strChecks: Array[(Int, Int, String)] =
    cols.zipWithIndex.collect {
      case (c, i) if c.src == StringType =>
        (i, c.w.asInstanceOf[SpssSavWriter.WStr].declLen, c.name)
    }

  override def write(row: InternalRow): Unit = {
    var j = 0
    while (j < strChecks.length) {
      val (i, w, name) = strChecks(j)
      if (!row.isNullAt(i) && row.getUTF8String(i).numBytes() > w)
        throw new IllegalArgumentException(
          s"sav streaming sink: string in column '$name' exceeds the " +
            s"declared width $w bytes — raise .option(\"strWidth.$name\", ...)")
      j += 1
    }
    enc.encode(row)
    out.write(enc.buf, 0, enc.recordLen)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StataChunkMessage(pid, chunk.getAbsolutePath, rows)
  }
  override def abort(): Unit = { out.close(); chunk.delete() }
  override def close(): Unit = ()
}
