package graft.readstat

import java.nio.file.Files

/** Catalog-label parity beyond the numeric sas7bdat path: char-format
  * ($-prefixed) labels, catalog on XPT scans (reference docs/read.md:148:
  * XPT files carry no labels — the catalog parameter attaches them),
  * inline catalog specs (the string-option analog of the reference's
  * pre-built dict, `_normalize_catalog` __init__.py:439-451), and the
  * column-keyed `catalog_labels` inspection surface (:453-475).
  */
class CatalogLabelSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft_cat").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name"
  }

  test("char-format catalog labels map string codes on a sas7bdat read") {
    import spark.implicits._
    val df = Seq((1.0, "ab", 1.0), (2.0, "cd", 2.0), (3.0, "zz", 3.0))
      .toDF("sex", "tag", "ord")
    val path = tmp("chario.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("varFormats", "sex:REGIONF8.|tag:$TAGF8.")
      .save(path)
    val cat = tmp("labels.sas7bcat")
    graft.spark.readstat.writers.SasCatalogWriter.write(cat,
      numeric = Map("REGIONF" -> Map(1.0 -> "East", 2.0 -> "West")),
      string = Map("$TAGF" -> Map("ab" -> "Alpha", "cd" -> "Delta")))
    // order by the unformatted column: the labeled ones are strings now
    val back = spark.read.format("readstat")
      .option("catalog", cat).option("valueLabelsAsStrings", "true")
      .load(path).orderBy("ord").collect()
    // numeric format: labeled, unlabeled code renders integral
    assert(back.map(_.getString(0)).toSeq == Seq("East", "West", "3"))
    // char format: matched codes map, unmatched pass through unchanged
    assert(back.map(_.getString(1)).toSeq == Seq("Alpha", "Delta", "zz"))
    // without valueLabelsAsStrings the catalog is inert (reference gate)
    val raw = spark.read.format("readstat").option("catalog", cat)
      .load(path).orderBy("ord").collect()
    assert(raw.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
    assert(raw.map(_.getString(1)).toSeq == Seq("ab", "cd", "zz"))
  }

  test("catalog labels attach to an xpt scan (numeric schema switch + char values)") {
    import spark.implicits._
    val df = Seq((1.0, "M", 9.5), (2.0, "F", 8.5)).toDF("region", "sex", "v")
    val path = tmp("t.xpt")
    df.write.format("readstat").mode("overwrite")
      .option("varFormats", "region:REGIONF8.|sex:$SEXF1.")
      .save(path)
    val cat = tmp("xlabels.sas7bcat")
    graft.spark.readstat.writers.SasCatalogWriter.write(cat,
      numeric = Map("REGIONF" -> Map(1.0 -> "East", 2.0 -> "West")),
      string = Map("$SEXF" -> Map("M" -> "Male", "F" -> "Female")))
    // xpt names uppercase on write (8-char short-name rules)
    val back = spark.read.format("readstat")
      .option("catalog", cat).option("valueLabelsAsStrings", "true")
      .load(path).orderBy(org.apache.spark.sql.functions.col("V").desc)
    // the labeled numeric column switched to StringType in the schema
    assert(back.schema("REGION").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(back.schema("V").dataType ==
      org.apache.spark.sql.types.DoubleType)
    val rows = back.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("East", "West"))
    assert(rows.map(_.getString(1)).toSeq == Seq("Male", "Female"))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(9.5, 8.5))
  }

  test("an inline catalog spec labels without a .sas7bcat file") {
    import spark.implicits._
    val df = Seq((1.0, "ab"), (2.0, "cd")).toDF("sex", "tag")
    val path = tmp("inline.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("varFormats", "sex:REGIONF8.|tag:$TAGF8.")
      .save(path)
    val back = spark.read.format("readstat")
      .option("catalog", "REGIONF:1=East;2=West|$TAGF:ab=Alpha;cd=Delta")
      .option("valueLabelsAsStrings", "true")
      .load(path).orderBy("tag").collect()
    assert(back.map(_.getString(0)).toSeq == Seq("East", "West"))
    assert(back.map(_.getString(1)).toSeq == Seq("Alpha", "Delta"))
  }

  test("a bad catalog spec fails loudly, naming both interpretations") {
    import spark.implicits._
    val df = Seq((1.0, "x")).toDF("sex", "tag")
    val path = tmp("bad.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("varFormats", "sex:REGIONF8.").save(path)
    val e = intercept[Exception] {
      spark.read.format("readstat")
        .option("catalog", "/no/such/file.sas7bcat")
        .option("valueLabelsAsStrings", "true")
        .load(path).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains(".sas7bcat") && m.contains("inline")),
      msgs(e).mkString(" | "))
  }

  test("facade catalogLabels reports column-keyed maps without reading data") {
    import spark.implicits._
    val df = Seq((1.0, "ab", 5.0)).toDF("sex", "tag", "v")
    val path = tmp("inspect.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("varFormats", "sex:REGIONF8.|tag:$TAGF8.")
      .save(path)
    val labels = graft.api.Readstat.catalogLabels(path,
      "REGIONF:1=East;2=West|$TAGF:ab=Alpha")
    assert(labels.keySet == Set("sex", "tag"), labels.toString)
    assert(labels("sex") == Map(1.0 -> "East", 2.0 -> "West"))
    assert(labels("tag") == Map("ab" -> "Alpha"))
    // unformatted columns and unmatched formats are absent, like the
    // reference's column-keyed dict
    assert(!labels.contains("v"))
  }

  test("xpt writer valueLabels emit a sibling catalog the read joins back") {
    import spark.implicits._
    // XPT carries no label records (reference docs/read.md:148) — the
    // writer routes labels to a .sas7bcat + generated namestr formats,
    // completing the documented catalog read pattern in BOTH directions
    val df = Seq((1.0, "ab", 1.0), (2.0, "cd", 2.0)).toDF("sex", "tag", "ord")
    val path = tmp("vl.xpt")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels", "sex:1=Male,2=Female|tag:ab=Alpha,cd=Delta")
      .save(path)
    val catPath = path.stripSuffix(".xpt") + ".sas7bcat"
    assert(new java.io.File(catPath).isFile, "sibling catalog not written")
    val back = spark.read.format("readstat")
      .option("catalog", catPath).option("valueLabelsAsStrings", "true")
      .load(path).orderBy("ORD").collect()
    assert(back.map(_.getString(0)).toSeq == Seq("Male", "Female"))
    assert(back.map(_.getString(1)).toSeq == Seq("Alpha", "Delta"))
  }

  test("sas and xpt streaming sinks carry valueLabels to the sibling catalog") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    for (ext <- Seq("sas7bdat", "xpt")) {
      val dir = Files.createTempDirectory(s"graft_catsink_$ext").toFile
      dir.deleteOnExit()
      val sink = s"$dir/stream.$ext"
      val input = MemoryStream[(Double, String)]
      val q = input.toDF().toDF("sex", "s").writeStream
        .format("readstat")
        .option("checkpointLocation", s"$dir/ckpt")
        .option("strWidth.s", "8")
        .option("valueLabels", "sex:1=Male,2=Female")
        .start(sink)
      try {
        input.addData((1.0, "a"))
        q.processAllAvailable()
        input.addData((2.0, "b"))
        q.processAllAvailable()
      } finally q.stop()
      val catPath = sink.stripSuffix(s".$ext") + ".sas7bcat"
      assert(new java.io.File(catPath).isFile, s"$ext: catalog not written")
      val back = spark.read.format("readstat")
        .option("catalog", catPath).option("valueLabelsAsStrings", "true")
        .load(sink)
      val col0 = if (ext == "xpt") "SEX" else "sex"
      assert(back.select(col0).collect().map(_.getString(0)).sorted.toSeq ==
        Seq("Female", "Male"), s"$ext labeled read-back")
    }
  }

  test("por writer carries valueLabels as tag-'D' records (r11, beyond reference)") {
    // r10 refused this option (refuse-rather-than-drop); r11 implements
    // it — the refusal test flips into a roundtrip pin
    import spark.implicits._
    val df = Seq((1.0, "x"), (2.0, "y")).toDF("sex", "s")
    val path = tmp("vl.por")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels", "sex:1=Male,2=Female")
      .save(path)
    val back = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(path)
    assert(back.select("SEX").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("Female", "Male"))
  }

  test("catalog option on a non-SAS-family scan refuses instead of no-opping") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_catref").toFile
    d.deleteOnExit()
    val dta = s"$d/x.dta"
    Seq((1.0, "a")).toDF("v", "s").write.format("readstat")
      .mode("overwrite").save(dta)
    val e = intercept[Exception] {
      spark.read.format("readstat")
        .option("catalog", "SEXF:1=Male").load(dta).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("sas7bdat/xpt scans only")),
      msgs(e).mkString(" | "))
  }

  test("format-foreign metadata options refuse loudly instead of dropping") {
    import spark.implicits._
    val df = Seq((1.0, "x")).toDF("v", "s")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    // single-format options on the wrong target (r11 matrix)
    Seq(("dtaVersion", "118", "sav"), ("xptVersion", "8", "dta"),
      ("compression", "rle", "dta"), ("library", "mylib", "xpt"),
      ("tableName", "T", "por")).foreach { case (k, v, ext) =>
      val e = intercept[Exception] {
        df.write.format("readstat").mode("overwrite")
          .option(k, v).save(tmp(s"f_$k.$ext"))
      }
      assert(msgs(e).exists(_.contains(s"option '$k' does not apply")),
        s"$k on .$ext: " + msgs(e).mkString(" | "))
    }
    // the SPSS dictionary surface on a dta target
    val e1 = intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("varMeasures", "v:scale").save(tmp("f1.dta"))
    }
    assert(msgs(e1).exists(_.contains("does not apply to this format")),
      msgs(e1).mkString(" | "))
    // NaN-payload tagged missings on a sav target
    val e2 = intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("taggedMissings", "v:s").save(tmp("f2.sav"))
    }
    assert(msgs(e2).exists(_.contains("does not apply to this format")),
      msgs(e2).mkString(" | "))
    // the options still work on their own formats
    df.write.format("readstat").mode("overwrite")
      .option("varMeasures", "v:scale").save(tmp("ok.sav"))
    df.write.format("readstat").mode("overwrite")
      .option("taggedMissings", "v:s").save(tmp("ok.dta"))
  }

  test("sas7bdat writer refuses mismatched format/column kinds loudly") {
    import spark.implicits._
    val df = Seq((1.0, "x")).toDF("n", "s")
    val e1 = intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("varFormats", "s:REGIONF8.").save(tmp("m1.sas7bdat"))
    }
    assert(e1.getMessage.contains("char format names must start"),
      e1.getMessage)
    val e2 = intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("varFormats", "n:$TAGF8.").save(tmp("m2.sas7bdat"))
    }
    assert(e2.getMessage.contains("char ($-prefixed) format on a numeric"),
      e2.getMessage)
  }
}
