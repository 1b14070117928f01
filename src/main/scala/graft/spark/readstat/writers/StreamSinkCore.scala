package graft.spark.readstat.writers

import java.io.File
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** Shared machinery for the single-file streaming sinks (dta/sav/xpt).
  *
  * All three formats share the property that makes in-place epoch
  * append possible: a CONSTANT-LENGTH pre-data section (only embedded
  * counts/offsets vary with the row total), fixed-width records, and a
  * constant-length (possibly empty) post-data section. One commit
  * algorithm therefore serves every format; each contributes only its
  * prefix/trailer bytes and its per-partition row encoder.
  *
  * Exactly-once protocol (shared): the sidecar `<path>.stream_state`
  * records (epochId, rows, rowLen) and is atomically REPLACE_EXISTING-
  * moved into place only AFTER the splice + fsync succeed. A replayed
  * epoch (restart from checkpoint) is skipped by id; a crash between
  * splice and state update is healed because the next commit positions
  * at the last COMMITTED row boundary, overwriting any partial bytes.
  */
object StreamSinkCore {

  case class StreamState(epoch: Long, rows: Long, rowLen: Int)

  private def statePath(path: String) = path + ".stream_state"

  def readState(path: String): Option[StreamState] = {
    val f = new File(statePath(path))
    if (!f.exists()) None
    else {
      val s = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      Some(StreamState(m.get("epoch").asLong(), m.get("rows").asLong(),
        m.get("rowLen").asInt()))
    }
  }

  def writeState(path: String, st: StreamState): Unit = {
    val tmp = Paths.get(statePath(path) + ".tmp")
    Files.write(tmp,
      s"""{"epoch":${st.epoch},"rows":${st.rows},"rowLen":${st.rowLen}}"""
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(statePath(path)),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** The one commit algorithm: rewrite prefix, splice chunks at the
    * committed row boundary, rewrite trailer, pad, truncate, fsync,
    * then (and only then) advance the sidecar state.
    *
    * @param prefix   pre-data bytes for a given row total; its LENGTH
    *                 must not depend on the total
    * @param trailer  post-data bytes for a given row total; same rule
    * @param padBlock if > 0, space-pad the end to this block size (xpt)
    */
  def commitEpoch(label: String, path: String, epochId: Long,
      chunks: Seq[(Int, String, Long)], rowLen: Int,
      prefix: Long => Array[Byte], trailer: Long => Array[Byte],
      padBlock: Int = 0): Unit = synchronized {
    val state = readState(path)
    try {
      state match {
        case Some(st) if epochId <= st.epoch => return // replayed epoch
        case Some(st) => require(st.rowLen == rowLen,
          s"$label streaming sink: schema drift — committed rowLen " +
            s"${st.rowLen} vs current $rowLen for $path; streams cannot " +
            "change schema mid-file")
        case None => ()
      }
      val prevRows = state.map(_.rows).getOrElse(0L)
      val total = prevRows + chunks.map(_._3).sum
      val pre = prefix(total)
      val post = trailer(total)
      val p = Paths.get(path)
      Option(p.getParent).foreach(Files.createDirectories(_))
      val ch = FileChannel.open(p, StandardOpenOption.CREATE,
        StandardOpenOption.WRITE)
      try {
        ch.position(0L)
        ch.write(ByteBuffer.wrap(pre))
        ch.position(pre.length + prevRows * rowLen)
        chunks.sortBy(_._1).foreach { case (_, f, _) =>
          val in = FileChannel.open(Paths.get(f), StandardOpenOption.READ)
          try { var pos = 0L; val n = in.size()
            while (pos < n) pos += in.transferTo(pos, n - pos, ch)
          } finally in.close()
        }
        require(ch.position() == pre.length + total * rowLen,
          s"$label streaming sink: chunk byte drift at epoch $epochId")
        ch.write(ByteBuffer.wrap(post))
        if (padBlock > 0) {
          val rem = (ch.position() % padBlock).toInt
          if (rem != 0) {
            val pad = new Array[Byte](padBlock - rem)
            java.util.Arrays.fill(pad, ' '.toByte)
            ch.write(ByteBuffer.wrap(pad))
          }
        }
        ch.truncate(ch.position())
        ch.force(true)
      } finally ch.close()
      writeState(path, StreamState(epochId, total, rowLen))
    } finally chunks.foreach { case (_, f, _) => new File(f).delete() }
  }

  /** Per-format plug-in: per-partition encoder on executors, epoch
    * commit on the driver. Implementations are stateless singletons so
    * the factory serializes trivially. */
  trait Format extends Serializable {
    def chunkWriter(schema: StructType, options: Map[String, String],
        pid: Int): DataWriter[InternalRow]
    def commit(path: String, epochId: Long, chunks: Seq[(Int, String, Long)],
        schema: StructType, options: Map[String, String]): Unit
  }

  def scratchFile(options: Map[String, String], tag: String, pid: Int): File = {
    val scratch = options.getOrElse("scratchDir",
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    Files.createDirectories(Paths.get(scratch))
    File.createTempFile(s"graft_${tag}_${pid}_", ".chunk", new File(scratch))
  }
}

/** One DSv2 StreamingWrite for every fixed-width single-file format. */
class FixedWidthStreamingWrite(path: String, schema: StructType,
    options: Map[String, String], fmt: StreamSinkCore.Format)
  extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new FixedWidthStreamWriterFactory(schema, options, fmt)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    fmt.commit(path, epochId,
      messages.collect { case m: StataChunkMessage => (m.pid, m.file, m.rows) },
      schema, options)

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: StataChunkMessage => new File(m.file).delete()
      case _ => ()
    }
}

class FixedWidthStreamWriterFactory(schema: StructType,
    options: Map[String, String], fmt: StreamSinkCore.Format)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    fmt.chunkWriter(schema, options, partitionId)
}
