package graft.spark.readstat.writers

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SAS import bundle: there is no public sas7bdat *write* format, so —
  * like the reference (src/sas/writer.rs:55-494) — we emit a CSV plus a
  * generated `.sas` script (DATA step with INFILE/INFORMAT/FORMAT/LABEL,
  * temporal columns pre-converted to SAS epoch values) that recreates the
  * dataset inside SAS.
  *
  * The CSV body is written distributed (per-partition chunks, driver
  * splice); the script is pure driver-side templating.
  */
object SasCsvBundleWriter {

  def write(df: DataFrame, path: String, options: Map[String, String]): Unit = {
    val schema = df.schema
    require(path.toLowerCase.endsWith(".csv"), "sas bundle path must end in .csv")

    // temporal → SAS epoch numerics; everything else → csv-safe strings
    val csvCols = schema.fields.map { f =>
      f.dataType match {
        case DateType =>
          (datediff(col(f.name), lit(java.sql.Date.valueOf("1960-01-01"))))
            .cast(IntegerType).as(f.name)
        case TimestampType | TimestampNTZType =>
          (col(f.name).cast(TimestampType).cast(DoubleType) + lit(3653.0 * 86400))
            .cast(LongType).as(f.name)
        case _ => col(f.name)
      }
    }

    val scratch = Files.createTempDirectory("graft_sascsv").toFile
    df.select(csvCols.toIndexedSeq: _*)
      .write.mode("overwrite")
      .option("header", "false").option("nullValue", "")
      .csv(scratch.getAbsolutePath)

    // driver splice: header + part files in order (temp + atomic rename)
    AtomicFile.write(path) { tmpOut =>
    val outPath = Paths.get(tmpOut)
    val ch = java.nio.channels.FileChannel.open(outPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    try {
      val header = schema.fieldNames.mkString(",") + "\n"
      ch.write(java.nio.ByteBuffer.wrap(header.getBytes(StandardCharsets.UTF_8)))
      scratch.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
        .foreach { p =>
          val in = java.nio.channels.FileChannel.open(p.toPath, StandardOpenOption.READ)
          try { var pos = 0L; val n = in.size()
            while (pos < n) pos += in.transferTo(pos, n - pos, ch)
          } finally in.close()
        }
    } finally ch.close()
    }
    scratch.listFiles().foreach(_.delete()); scratch.delete()

    // generated SAS import script
    val dsName = new File(path).getName.stripSuffix(".csv")
      .replaceAll("[^A-Za-z0-9_]", "_").take(32)
    val valueLabels = StataDtaWriter.parseValueLabels(
      options.getOrElse("valueLabels", ""))
    val sb = new StringBuilder
    valueLabels.foreach { case (c, pairs) =>
      sb.append(s"proc format;\n  value ${c}_fmt\n")
      pairs.foreach { case (code, label) =>
        sb.append(s"""    $code = "${label.replace("\"", "\"\"")}"\n""")
      }
      sb.append("  ;\nrun;\n\n")
    }
    sb.append(s"data $dsName;\n")
    sb.append(s"""  infile "${new File(path).getName}" dsd firstobs=2 truncover;\n""")
    sb.append("  input\n")
    schema.fields.foreach { f =>
      val spec = f.dataType match {
        case StringType => s"${f.name} : $$255."
        case _ => s"${f.name}"
      }
      sb.append(s"    $spec\n")
    }
    sb.append("  ;\n")
    schema.fields.foreach { f =>
      f.dataType match {
        case DateType => sb.append(s"  format ${f.name} date9.;\n")
        case TimestampType | TimestampNTZType =>
          sb.append(s"  format ${f.name} datetime20.;\n")
        case _ =>
      }
      if (valueLabels.contains(f.name))
        sb.append(s"  format ${f.name} ${f.name}_fmt.;\n")
    }
    sb.append("run;\n")
    AtomicFile.write(path.stripSuffix(".csv") + ".sas")(tmp =>
      Files.writeString(Paths.get(tmp), sb.toString))
  }
}
