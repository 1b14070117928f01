package graft.spark.readstat

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("readstat-metadata").load(path)` — per-variable
  * metadata as a DataFrame with the reference's canonical 12 columns
  * (reference: src/metadata_df.rs:149-198). One row per variable.
  */
class ReadstatMetadataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "readstat-metadata"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MetadataRows.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("readstat-metadata: no path"))
    new MetadataTable(path)
  }
}

object MetadataRows {
  val schema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("label", StringType),
    StructField("value_label_codes", ArrayType(StringType)),
    StructField("value_label_labels", ArrayType(StringType)),
    StructField("format", StringType),
    StructField("format_type", IntegerType),
    StructField("format_width", IntegerType),
    StructField("format_decimals", IntegerType),
    StructField("measure", StringType),
    StructField("display_width", IntegerType),
    StructField("alignment", StringType),
    StructField("string_width_bytes", IntegerType)))

  private def s(v: String): Any =
    if (v == null || v.isEmpty) null else UTF8String.fromString(v)
  private def arr(v: Seq[String]): ArrayData =
    if (v.isEmpty) null
    else new GenericArrayData(v.map(x => UTF8String.fromString(x)).toArray[Any])

  def rowsFor(path: String): Seq[InternalRow] = {
    val lower = path.toLowerCase
    if (lower.endsWith(".dta")) {
      val md = StataModule.metadata(path)
      md.variables.map { v =>
        val vl = v.valueLabelName.flatMap(n => md.valueLabels.find(_.name == n))
        val codes = vl.map(_.mapping.keys.toSeq.sorted.map(_.toString)).getOrElse(Nil)
        val labels = vl.map(t => t.mapping.keys.toSeq.sorted.map(t.mapping)).getOrElse(Nil)
        mk(v.name, v.label.orNull, codes, labels, v.format.orNull, -1, -1, -1,
          null, -1, null,
          v.varType match {
            case graft.core.stata.StataTypes.TStr(w) => w
            case _ => -1
          })
      }
    } else if (lower.endsWith(".sav") || lower.endsWith(".zsav")) {
      val md = SpssModule.metadata(path)
      md.vars.map { v =>
        val codes = (v.numLabels.keys.toSeq.sorted.map(d =>
          if (d == math.rint(d)) d.toLong.toString else d.toString) ++
          v.strLabels.keys.toSeq.sorted)
        val labels = (v.numLabels.toSeq.sortBy(_._1).map(_._2) ++
          v.strLabels.toSeq.sortBy(_._1).map(_._2))
        mk(v.name, v.label.orNull, codes, labels, null,
          v.formatType, v.formatWidth, v.formatDecimals,
          v.measure.orNull, v.displayWidth.getOrElse(-1), v.alignment.orNull,
          if (v.isString) v.stringLen else -1)
      }
    } else if (lower.endsWith(".sas7bdat")) {
      val md = SasModule.metadata(path)
      md.columns.map { c =>
        mk(c.name, c.label, Nil, Nil, c.format, -1, -1, -1, null, -1, null,
          if (c.isChar) c.length else -1)
      }
    } else if (lower.endsWith(".xpt") || lower.endsWith(".xpt5") ||
        lower.endsWith(".xpt8")) {
      val md = XptModule.metadata(path)
      md.columns.map { c =>
        mk(c.name, c.label, Nil, Nil, c.format, -1, -1, -1, null, -1, null,
          if (c.isChar) c.width else -1)
      }
    } else if (lower.endsWith(".por")) {
      val md = PorModule.metadata(path)
      md.vars.map { v =>
        mk(v.name, v.label.orNull, Nil, Nil, null, v.fmtType, v.fmtWidth,
          v.fmtDec, null, -1, null, if (v.isString) v.width else -1)
      }
    } else throw new IllegalArgumentException(s"readstat-metadata: $path")
  }

  private def mk(name: String, label: String, codes: Seq[String],
      labels: Seq[String], format: String, ft: Int, fw: Int, fd: Int,
      measure: String, dw: Int, align: String, strW: Int): InternalRow = {
    val r = new GenericInternalRow(12)
    r.update(0, s(name)); r.update(1, s(label))
    r.update(2, arr(codes)); r.update(3, arr(labels))
    r.update(4, s(format))
    r.update(5, if (ft < 0) null else ft)
    r.update(6, if (fw < 0) null else fw)
    r.update(7, if (fd < 0) null else fd)
    r.update(8, s(measure))
    r.update(9, if (dw < 0) null else dw)
    r.update(10, s(align))
    r.update(11, if (strW < 0) null else strW)
    r
  }
}

class MetadataTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"readstat-metadata:$path"
  override def schema(): StructType = MetadataRows.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = MetadataRows.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(RangePartition(path, 0, 1))
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
            val it = MetadataRows.rowsFor(p.asInstanceOf[RangePartition].path).iterator
            new PartitionReader[InternalRow] {
              private var cur: InternalRow = _
              override def next(): Boolean =
                if (it.hasNext) { cur = it.next(); true } else false
              override def get(): InternalRow = cur
              override def close(): Unit = ()
            }
          }
        }
    }
}
