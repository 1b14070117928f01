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

  test("dta/SAS format triple stays null like the reference accumulator") {
    // reference: src/stata/metadata.rs:87 and src/sas/metadata.rs:884 push
    // None for format_type/width/decimals — the format string alone carries
    // the information for those formats
    for (p <- Seq(res("fixtures/stata/stata13_dates.dta"),
        res("fixtures/sas/dates.sas7bdat"))) {
      val df = spark.read.format("readstat-metadata").load(p)
      assert(df.filter("format IS NOT NULL").count() > 0, p)
      assert(df.filter("format_type IS NOT NULL OR format_width IS NOT NULL" +
        " OR format_decimals IS NOT NULL").count() == 0, p)
    }
  }

  test("file-level metadata across all five formats") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_filemeta").toFile
    dir.deleteOnExit()
    val xpt = s"${dir.getAbsolutePath}/t.xpt"
    val por = s"${dir.getAbsolutePath}/t.por"
    val data = (1 to 42).map(i => (i, i * 1.5, s"v$i")).toDF("a", "b", "c")
    data.write.format("readstat").mode("overwrite").save(xpt)
    data.write.format("readstat").mode("overwrite").save(por)

    def one(path: String) = {
      val rows = spark.read.format("readstat-file-metadata").load(path).collect()
      assert(rows.length == 1, path)
      rows(0)
    }

    val dta = one(res("fixtures/stata/stata14_118.dta"))
    assert(dta.getAs[String]("format") == "dta")
    assert(dta.getAs[Long]("row_count") == 5L)
    assert(dta.getAs[Int]("var_count") == 7)
    assert(dta.getAs[String]("encoding") == "UTF-8")
    assert(dta.getAs[String]("created") != null) // dta header timestamp
    assert(dta.getAs[String]("details").contains("\"version\":118"))

    val sav = one(res("fixtures/spss/sample.sav"))
    assert(sav.getAs[String]("format") == "sav")
    assert(sav.getAs[Long]("row_count") == 5L)
    assert(sav.getAs[String]("details").contains("\"compression\":\"Bytecode\""))

    val zsav = one(res("fixtures/spss/sample.zsav"))
    assert(zsav.getAs[String]("format") == "zsav")
    assert(zsav.getAs[String]("details").contains("\"compression\":\"Zsav\""))

    val sas = one(res("fixtures/sas/owner.sas7bdat"))
    assert(sas.getAs[String]("format") == "sas7bdat")
    assert(sas.getAs[Int]("var_count") == 3)
    assert(sas.getAs[String]("created") != null) // 1960-epoch header double
    assert(sas.getAs[String]("details").contains("\"sas_release\""))

    val xm = one(xpt)
    assert(xm.getAs[String]("format") == "xpt")
    assert(xm.getAs[Long]("row_count") == 42L)
    assert(xm.getAs[Int]("var_count") == 3)

    val pm = one(por)
    assert(pm.getAs[String]("format") == "por")
    assert(pm.isNullAt(pm.fieldIndex("row_count"))) // POR header records none
    assert(pm.getAs[Int]("var_count") == 3)

    // multi-file load: one row per file, fanned out one partition each
    val multi = spark.read.format("readstat-file-metadata").load(xpt, por)
    assert(multi.count() == 2)
    assert(multi.rdd.getNumPartitions == 2)

    // directory load expands to the stat files inside it
    val byDir = spark.read.format("readstat-file-metadata")
      .load(dir.getAbsolutePath)
    assert(byDir.count() == 2)
    assert(byDir.select("format").collect().map(_.getString(0)).sorted.toSeq
      == Seq("por", "xpt"))
  }
}
