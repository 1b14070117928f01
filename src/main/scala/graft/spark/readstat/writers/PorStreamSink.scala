package graft.spark.readstat.writers

import java.io.{BufferedOutputStream, File, FileInputStream}
import java.nio.ByteBuffer
import java.nio.channels.{Channels, FileChannel}
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.DataWriter
import org.apache.spark.sql.types.StructType

/** SINGLE-FILE streaming .por sink — BEYOND the reference (streaming
  * sink is Stata-only there) and the last format to join the matrix.
  *
  * POR looks append-hostile (a sequential 80-column text transport with
  * variable-length base-30 cells) but has the two properties that make
  * epoch append work:
  *
  *  1. The pre-data section stores NO row count — like xpt, the header
  *     is written once and never patched.
  *  2. The cell encoding is POSITION-INDEPENDENT: the 80-column lines
  *     are a transport wrapper ('\n' every 80 logical chars; the reader
  *     pads short lines with spaces and keeps reading), so executors
  *     can encode LOGICAL byte chunks (no newlines) and the driver
  *     commit re-wraps them from the resumed line position.
  *
  * Commit: truncate the previous trailer (the 'Z' fill recorded as
  * `extra = "dataLen:linePos"` in the sidecar), stream the epoch's
  * logical chunks through a resumed [[PorWriterImpl.LineWriter]],
  * re-emit the 'Z' trailer, fsync, then advance the sidecar. A crash
  * between splice and state update heals because the next commit
  * truncates back to the last COMMITTED data byte. Same exactly-once /
  * schema-fingerprint contract as [[StreamSinkCore]]; every header-
  * shaping option (varLabels/fileLabel/varFormats/valueLabels/
  * missingValues) joins the fingerprint because the header is written
  * once — a cross-query append declaring different header text would
  * otherwise silently disagree with the committed prefix.
  */
object PorStreamSink extends StreamSinkCore.Format {

  import PorWriterImpl.{LineWriter, PorOpts}

  private def headerBytes(schema: StructType, o: PorOpts): (Array[Byte], Int) = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = new LineWriter(bos)
    PorWriterImpl.writeHeader(w, schema, o)
    (bos.toByteArray, w.position)
  }

  override def chunkWriter(schema: StructType, options: Map[String, String],
      pid: Int): DataWriter[InternalRow] =
    new PorChunkWriter(schema, options, pid)

  override def commit(path: String, epochId: Long, queryId: String,
      chunks: Seq[(Int, String, Long)], schema: StructType,
      options: Map[String, String]): Unit = synchronized {
    require(!options.contains("metadataPath"),
      "por streaming sink: metadataPath is not supported — use the batch writer")
    try {
      val o = PorWriterImpl.parsePorOptions(schema, options, None)
      val schemaHash = StreamSinkCore.hashSpecs(
        schema.fields.map(f => s"${f.name}|${f.dataType.catalogString}").toIndexedSeq
          ++ Seq("|vl:" + options.getOrElse("varLabels", ""),
            "|fl:" + options.getOrElse("fileLabel", ""),
            "|vf:" + options.getOrElse("varFormats", ""),
            "|vll:" + options.getOrElse("valueLabels", ""),
            "|mv:" + options.getOrElse("missingValues", "")))
      val state = StreamSinkCore.readState(path)
      val replayed = state.exists(st =>
        st.queryId == queryId && epochId <= st.epoch)
      if (replayed) return
      state.foreach { st =>
        require(st.schemaHash.isEmpty || st.schemaHash == schemaHash,
          s"por streaming sink: schema drift — the file at $path was " +
            s"committed with a different column/option layout " +
            s"(fingerprint ${st.schemaHash}) than this query produces " +
            s"($schemaHash); appends cannot change schema or header " +
            "options mid-file")
      }
      val (hdr, hdrPos) = headerBytes(schema, o)
      state.foreach(st => require(st.preLen < 0 || st.preLen == hdr.length,
        s"por streaming sink: pre-data section length changed " +
          s"(${st.preLen} -> ${hdr.length}) for $path — appends must " +
          "declare the same labels/formats as the original write"))
      // resume point: byte length of committed DATA (trailer excluded)
      // and the logical position within the current 80-char line
      val resume: Option[(Long, Int)] = state.flatMap { st =>
        st.extra.split(":") match {
          case Array(a, b) => Some((a.toLong, b.toInt))
          case _ => None
        }
      }
      val p = Paths.get(path)
      Option(p.getParent).foreach(Files.createDirectories(_))
      val ch = FileChannel.open(p, StandardOpenOption.CREATE,
        StandardOpenOption.READ, StandardOpenOption.WRITE)
      try {
        val startPos = resume match {
          case Some((dataLen, linePos)) =>
            ch.truncate(dataLen); ch.position(dataLen); linePos
          case None =>
            ch.truncate(0L); ch.position(0L)
            ch.write(ByteBuffer.wrap(hdr)); hdrPos
        }
        val os = new BufferedOutputStream(Channels.newOutputStream(ch), 1 << 20)
        val w = new LineWriter(os, startPos = startPos)
        // block reads, not per-byte stream calls — the line-wrap counter
        // still advances per byte, but the synchronized InputStream.read()
        // overhead disappears from the single-threaded commit path
        val block = new Array[Byte](1 << 16)
        chunks.sortBy(_._1).foreach { case (_, f, _) =>
          val in = new FileInputStream(f)
          try {
            var n = in.read(block)
            while (n > 0) {
              var i = 0
              while (i < n) { w.byte(block(i) & 0xff); i += 1 }
              n = in.read(block)
            }
          } finally in.close()
        }
        os.flush()
        val newDataLen = ch.position()
        val newLinePos = w.position
        w.byte('Z'); w.finishWithZ()
        os.flush()
        ch.force(true)
        val total = state.map(_.rows).getOrElse(0L) + chunks.map(_._3).sum
        StreamSinkCore.writeState(path, StreamSinkCore.StreamState(
          epochId, total, 0, queryId, schemaHash, hdr.length.toLong,
          s"$newDataLen:$newLinePos"))
      } finally ch.close()
    } finally chunks.foreach { case (_, f, _) => new File(f).delete() }
  }
}

/** Executor-side chunk encoder: LOGICAL POR bytes (wrap = false — the
  * driver commit inserts the line breaks at the resumed position). */
class PorChunkWriter(schema: StructType, options: Map[String, String],
    pid: Int) extends ChunkWriterBase(options, "spor", pid) {
  // validate header-shaping options on the executor too, so a bad spec
  // fails the task instead of surfacing only at commit
  PorWriterImpl.parsePorOptions(schema, options, None)
  private val w = new PorWriterImpl.LineWriter(out, wrap = false)
  private val fields = schema.fields
  private var n = 0L
  override protected def rowsWritten: Long = n

  override def write(row: InternalRow): Unit = {
    PorWriterImpl.encodeRow(w, fields, row)
    n += 1
  }
}
