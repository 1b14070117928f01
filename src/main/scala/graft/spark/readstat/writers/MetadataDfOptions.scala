package graft.spark.readstat.writers

import org.apache.spark.sql.SparkSession

/** Writer-side view of a saved `readstat-metadata` 12-column frame
  * (the reference's `write_readstat(metadata=...)` /
  * `write_xpt_from_df` path, pybindings.rs:1375-1428: labels, value
  * labels, formats, SPSS measures, and string storage widths are
  * extracted automatically; explicit writer options always win).
  *
  * The frame may describe variables absent from the frame being
  * written (a projected subset) — callers filter to their own columns.
  */
final case class MetadataDfOptions(
    varLabels: Map[String, String],
    // raw code strings: Stata narrows to the numeric entries (its value
    // labels are int-keyed), the sav writer takes strings as-is (type-3
    // slots / subtype 21 for wide values)
    valLabels: Map[String, Seq[(String, String)]],
    measures: Map[String, String],
    formats: Map[String, String],
    // SPSS/POR numeric print formats come through as the parsed
    // (type, width, decimals) triple — the `format` string column is
    // null for sav by design (MetadataSource mirrors the reference's
    // accumulator, which only parses triples for SPSS)
    formatTriples: Map[String, (Int, Int, Int)],
    stringWidths: Map[String, Int],
    // SPSS-specific display attributes (reference docs/write.md: the
    // metadata= path "carries over ... measure, alignment, display
    // width"); consumed by the sav writer only
    displayWidths: Map[String, Int] = Map.empty,
    alignments: Map[String, String] = Map.empty)

object MetadataDfOptions {

  def read(spark: SparkSession, path: String): MetadataDfOptions = {
    val mdf = spark.read.parquet(path)
    var varLabels = Map.empty[String, String]
    var valLabels = Map.empty[String, Seq[(String, String)]]
    var measures = Map.empty[String, String]
    var formats = Map.empty[String, String]
    var triples = Map.empty[String, (Int, Int, Int)]
    var widths = Map.empty[String, Int]
    var dispW = Map.empty[String, Int]
    var aligns = Map.empty[String, String]
    mdf.select("name", "label", "value_label_codes", "value_label_labels",
        "measure", "format", "string_width_bytes",
        "format_type", "format_width", "format_decimals",
        "display_width", "alignment")
      .collect().foreach { r =>
        val name = r.getString(0)
        if (!r.isNullAt(1) && r.getString(1).nonEmpty)
          varLabels += name -> r.getString(1)
        if (!r.isNullAt(2) && !r.isNullAt(3)) {
          val pairs = r.getSeq[String](2).zip(r.getSeq[String](3))
            .map { case (c, l) => c.trim -> l }
          if (pairs.nonEmpty) valLabels += name -> pairs
        }
        if (!r.isNullAt(4) && r.getString(4).nonEmpty)
          measures += name -> r.getString(4)
        if (!r.isNullAt(5) && r.getString(5).nonEmpty)
          formats += name -> r.getString(5)
        if (!r.isNullAt(6) && r.getInt(6) > 0) widths += name -> r.getInt(6)
        if (!r.isNullAt(7) && r.getInt(7) > 0)
          triples += name -> ((r.getInt(7),
            if (r.isNullAt(8)) 0 else r.getInt(8),
            if (r.isNullAt(9)) 0 else r.getInt(9)))
        if (!r.isNullAt(10) && r.getInt(10) > 0) dispW += name -> r.getInt(10)
        if (!r.isNullAt(11)) {
          val a = r.getString(11).trim.toLowerCase
          if (Set("left", "right", "center")(a)) aligns += name -> a
        }
      }
    MetadataDfOptions(varLabels, valLabels, measures, formats, triples,
      widths, dispW, aligns)
  }
}
