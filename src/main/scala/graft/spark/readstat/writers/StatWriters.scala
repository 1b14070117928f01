package graft.spark.readstat.writers

import org.apache.spark.sql.DataFrame

/** Extension-dispatched write entry (`df.write.format("readstat").save(p)`
  * and `graft.api.Readstat.write`). Mirrors the reference's
  * `write_readstat` dispatch (reference: __init__.py:708-878).
  */
object StatWriters {
  def write(df: DataFrame, path: String, options: Map[String, String]): Unit = {
    val lower = path.toLowerCase
    if (lower.endsWith(".dta")) StataDtaWriter.write(df, path, options)
    else if (lower.endsWith(".sav")) SpssSavWriter.write(df, path, options, zlib = false)
    else if (lower.endsWith(".zsav")) SpssSavWriter.write(df, path, options, zlib = true)
    else if (lower.endsWith(".xpt")) XptWriterImpl.write(df, path, options)
    else if (lower.endsWith(".por")) PorWriterImpl.write(df, path, options)
    else if (lower.endsWith(".csv")) SasCsvBundleWriter.write(df, path, options)
    else throw new IllegalArgumentException(
      s"readstat writer: unsupported extension for $path " +
        "(expected .dta/.sav/.zsav/.xpt/.por/.csv[+sas script])")
  }
}
