package graft.readstat

/** readstat-metadata format: 12-column per-variable metadata DataFrame
  * (reference: src/metadata_df.rs:149-198). */
class MetadataSpec extends SparkTestBase {
  test("metadata table for dta with value labels") {
    val df = spark.read.format("readstat-metadata")
      .load(res("fixtures/stata/stata14_118.dta"))
    assert(df.columns.toSeq == Seq("name", "label", "value_label_codes",
      "value_label_labels", "format", "format_type", "format_width",
      "format_decimals", "measure", "display_width", "alignment",
      "string_width_bytes"))
    val rows = df.collect()
    assert(rows.length == 7)
    val bytes = rows.find(_.getString(0) == "Bytes").get
    assert(bytes.getSeq[String](2).nonEmpty) // has value label codes
  }

  test("metadata table for sav includes measure/format fields") {
    val df = spark.read.format("readstat-metadata")
      .load(res("fixtures/spss/sample.sav"))
    val r = df.collect().find(_.getString(0) == "mylabl").get
    assert(r.getInt(5) == 5)  // format_type F
    assert(r.getInt(6) == 8)  // width
    assert(r.getSeq[String](2) == Seq("1", "2"))
    assert(r.getSeq[String](3) == Seq("Male", "Female"))
  }

  test("metadata table for sas7bdat") {
    val df = spark.read.format("readstat-metadata")
      .load(res("fixtures/sas/owner.sas7bdat"))
    assert(df.count() == 3)
    assert(df.filter("string_width_bytes IS NOT NULL").count() > 0)
  }
}
