package graft.spark.readstat

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

// Phase C format modules — planned in SURVEY.md §7.2 build order.
// Each throws until implemented so extension dispatch stays total.

private[readstat] abstract class NotYetImplemented(fmt: String) extends FormatModule {
  private def nyi = throw new UnsupportedOperationException(
    s"$fmt reader not yet implemented")
  override def schema(path: String, opts: ReadstatOptions): StructType = nyi
  override def planPartitions(path: String, opts: ReadstatOptions,
      limit: Option[Long]): Seq[RangePartition] = nyi
  override def rows(part: RangePartition, opts: ReadstatOptions,
      required: StructType): Iterator[InternalRow] = nyi
}

