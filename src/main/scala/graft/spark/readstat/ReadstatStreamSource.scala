package graft.spark.readstat

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** File-arrival micro-batch stream over a directory of stat files:
  * `spark.readStream.format("readstat").load(dir)`.
  *
  * Offsets are the sorted set of file names seen so far (the same model
  * as Spark's built-in file stream source, without its compaction log —
  * stat-file drops are immutable once present, so a name either is or
  * is not in the offset). Each batch plans the NEW files through the
  * regular per-format partitioners, so a single large arrival still
  * fans out across executors; decoding reuses the batch row readers
  * unchanged (mergeSchema semantics included).
  */
class ReadstatMicroBatchStream(dir: String, required: StructType,
    opts: ReadstatOptions) extends MicroBatchStream {

  // Files admitted into offsets so far. Offsets must grow monotonically,
  // so admission is remembered here rather than re-derived per listing.
  private val admitted = scala.collection.mutable.TreeSet[String]()

  private def signatures(): Map[String, (Long, Long)] =
    MetadataPaths.expandDirectory(dir).map { p =>
      val f = new java.io.File(p)
      p -> (f.length(), f.lastModified())
    }.toMap

  private case class FilesOffset(files: Seq[String]) extends Offset {
    override def json(): String = {
      val m = new ObjectMapper()
      val arr = m.createArrayNode()
      files.foreach(arr.add)
      m.writeValueAsString(arr)
    }
  }

  override def initialOffset(): Offset = FilesOffset(Nil)

  /** Admit a file only once it looks fully written. This repo's own
    * writers create files in place at their final name (no atomic
    * rename), so a file listed the instant it appears can be half-written
    * — and for XPT a prefix read succeeds silently, making the short read
    * permanent data loss once the offset marks it consumed. A new file is
    * admitted only when its (size, mtime) signature is unchanged across
    * two listings `streamStabilityMs` apart (re-checked within the call
    * so a quiesced landing zone is never delayed a full trigger; a file
    * still changing stays pending and is re-examined next trigger).
    * `streamStabilityMs=0` disables the check for landing zones with an
    * enforced atomic rename-into-place drop convention. */
  override def latestOffset(): Offset = synchronized {
    val first = signatures()
    val fresh = first.keySet.diff(admitted)
    if (fresh.isEmpty || opts.streamStabilityMs <= 0) admitted ++= fresh
    else {
      Thread.sleep(opts.streamStabilityMs)
      val second = signatures()
      fresh.foreach { p => if (second.get(p).contains(first(p))) admitted += p }
    }
    FilesOffset(admitted.toList)
  }

  override def deserializeOffset(json: String): Offset = {
    val node = new ObjectMapper().readTree(json)
    require(node.isArray, s"readstat stream: bad offset $json")
    FilesOffset((0 until node.size()).map(i => node.get(i).asText()))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[FilesOffset].files.toSet
    val fresh = end.asInstanceOf[FilesOffset].files.filterNot(seen)
    DriverPar.mapOrdered(fresh)(p =>
        Formats.moduleFor(p).planPartitions(p, opts, None))
      .flatten.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // row path unconditionally: future files' regimes are unknown at
    // stream start, and Spark requires uniform row-vs-columnar partitions
    new ReadstatPartitionReaderFactory(required, opts, columnar = false)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
