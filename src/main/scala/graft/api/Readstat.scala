package graft.api

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** One-call facade over the connector, mapping 1:1 to the reference's
  * public API so a `polars_readstat` user can switch without learning
  * the DataSource surface first (reference: polars_readstat/__init__.py —
  * `scan_readstat` :498, `read_readstat` :680, `write_readstat` :708,
  * `read_sas7bcat` :386):
  *
  *  - `Readstat.scan(spark, path)` — lazy DataFrame (Spark frames are
  *    always lazy, so scan == read; both names exist for familiarity)
  *  - `Readstat.read(spark, path)` — same
  *  - `Readstat.write(df, path)` — extension-dispatched write
  *  - `Readstat.readSas7bcat(path)` — catalog `format → (code → label)`
  *  - `Readstat.metadata(spark, path)` — 12-col per-variable frame
  *  - `Readstat.fileMetadata(spark, paths)` — one row per file
  *
  * All options of the `readstat` format apply (valueLabelsAsStrings,
  * informativeNulls, compress, mergeSchema, multiFile, dtaVersion, …).
  */
object Readstat {

  private def reader(spark: SparkSession,
      options: Map[String, String]): DataFrameReader =
    spark.read.format("readstat").options(options)

  /** Lazy scan of one or more stat files / directories. */
  def scan(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    reader(spark, options).load(path)

  /** Alias of [[scan]] — Spark DataFrames are lazy either way. */
  def read(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    scan(spark, path, options)

  /** Multi-path variant (mixable formats with `mergeSchema`). */
  def scanAll(spark: SparkSession, paths: Seq[String],
      options: Map[String, String] = Map.empty): DataFrame =
    reader(spark, options).load(paths: _*)

  /** Write `df` to the stat format named by `path`'s extension
    * (.dta/.sav/.zsav/.xpt/.por/.csv bundle). `multiFile=true` writes a
    * directory of self-contained part files instead of one file. */
  def write(df: DataFrame, path: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("readstat").options(options)
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(path)

  /** The reference's `sink_stata` (pybindings.rs:951-1096) as one call:
    * start a Structured Streaming query that appends every micro-batch
    * into ONE valid .dta (or, beyond the reference, .sav/.zsav/.xpt/
    * .sas7bdat).
    * String widths are declared via `strWidth.<col>` / `defaultStrWidth`
    * options — an unbounded stream cannot be pre-passed for widths like
    * the reference's finite lazy frame. Returns the running query;
    * callers stop it (or `awaitTermination`) like any stream. */
  def sink(df: DataFrame, path: String, checkpoint: String,
      options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(df.isStreaming,
      "Readstat.sink expects a STREAMING DataFrame; use Readstat.write for batch")
    df.writeStream.format("readstat")
      .option("checkpointLocation", checkpoint)
      .options(options)
      .start(path)
  }

  /** SAS format catalog as plain maps: numeric and string value-label
    * sets keyed by format name (reference `read_sas7bcat`). */
  def readSas7bcat(path: String): graft.core.sas.SasCatalog.Catalog =
    graft.core.sas.SasCatalog.read(path)

  /** Which catalog labels WOULD apply to a file's columns, without
    * reading data — the reference's `ScanReadstat.catalog_labels`
    * property (__init__.py:89-98, mapped column-name-keyed via
    * `_catalog_to_column_labels` :453-475). `catalog` is a .sas7bcat
    * path or an inline `FMT:code=Label;…|FMT2:…` spec. Numeric-format
    * columns map Double codes, char-format columns String codes (the
    * reference's mixed `float | str` dict keys, split by column type).
    * Supported for the formats that carry SAS format names (.sas7bdat,
    * .xpt). */
  def catalogLabels(path: String, catalog: String)
      : Map[String, Map[Any, String]] = {
    val lower = path.toLowerCase
    val cols: Seq[(String, String, Boolean)] =
      if (lower.endsWith(".sas7bdat"))
        graft.spark.readstat.SasModule.metadata(path).columns
          .map(c => (c.name, c.format, c.isChar))
      else if (lower.endsWith(".xpt") || lower.endsWith(".xpt5") ||
          lower.endsWith(".xpt8") || lower.endsWith(".xpt9"))
        graft.spark.readstat.XptModule.metadata(path).columns
          .map(c => (c.name, c.format, c.isChar))
      else throw new IllegalArgumentException(
        "catalogLabels: catalog labels attach by SAS format name — " +
          s"supported for .sas7bdat and .xpt files (got $path)")
    val cat = graft.spark.readstat.CatalogResolver.resolve(catalog)
    cols.flatMap { case (name, fmt, isChar) =>
      if (fmt.isEmpty) None
      else {
        val key = graft.spark.readstat.CatalogResolver.fmtKey(fmt)
        if (isChar)
          cat.string.get(key).map(m =>
            name -> m.map { case (k, v) => (k: Any) -> v })
        else
          cat.numeric.get(key).map(m =>
            name -> m.map { case (k, v) => (k: Any) -> v })
      }
    }.toMap
  }

  /** The reference's canonical 12-column per-variable metadata frame. */
  def metadata(spark: SparkSession, path: String): DataFrame =
    spark.read.format("readstat-metadata").load(path)

  /** One row per file: row count, encoding, file label, created
    * timestamp, format-specific details JSON. */
  def fileMetadata(spark: SparkSession, paths: String*): DataFrame =
    spark.read.format("readstat-file-metadata").load(paths: _*)
}
