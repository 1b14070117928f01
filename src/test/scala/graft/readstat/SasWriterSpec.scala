package graft.readstat

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Binary .sas7bdat writer (BEYOND the reference, which refuses SAS
  * binary writes): roundtrips through our own sas7bdat reader — the
  * same parser that is golden-tested against pandas over the reference
  * fixture matrix, so a value-exact roundtrip certifies the written
  * layout, not just writer/reader symmetry.
  */
class SasWriterSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft_saswr").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name"
  }

  test("all-types roundtrip: numerics, strings, temporals, nulls") {
    import spark.implicits._
    val df = Seq(
      (1, 1.5, "alpha", java.sql.Date.valueOf("2020-03-01"),
        java.sql.Timestamp.valueOf("2021-06-07 08:09:10.5"), true),
      (2, -2.25, "b", java.sql.Date.valueOf("1959-12-31"),
        java.sql.Timestamp.valueOf("1959-01-01 00:00:01"), false),
      (3, 0.0, "", null, null, true)
    ).toDF("id", "v", "s", "d", "ts", "flag")
      .withColumn("v2", when(col("id") === 3, lit(null)).otherwise(col("v")))
    val path = tmp("all.sas7bdat")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path)
    // column ORDER survives even though the row layout packs numerics first
    assert(back.columns.toSeq == Seq("id", "v", "s", "d", "ts", "flag", "v2"))
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, -2.25, 0.0))
    // blank chars read as null under the default missingStringAsNull
    assert(rows.map(_.getString(2)).toSeq == Seq("alpha", "b", null))
    assert(rows(0).getAs[java.sql.Date](3).toString == "2020-03-01")
    assert(rows(1).getAs[java.sql.Date](3).toString == "1959-12-31")
    assert(rows(2).isNullAt(3) && rows(2).isNullAt(4) && rows(2).isNullAt(6))
    assert(rows(0).getAs[java.time.LocalDateTime](4).toString ==
      "2021-06-07T08:09:10.500")
    assert(rows.map(_.getDouble(5)).toSeq == Seq(1.0, 0.0, 1.0))
    // the derived temporal formats typed the read-back columns
    val md = graft.core.sas.SasCore.parse(path)
    assert(md.columns.find(_.name == "d").get.format == "DATE")
    assert(md.columns.find(_.name == "ts").get.format == "DATETIME")
    assert(md.datasetName == "ALL")
  }

  test("multi-page multi-partition write reads back exactly") {
    import spark.implicits._
    val n = 200000 // ~3 MB of rows: tens of data pages across partitions
    val df = (1 to n).map(i => (i.toLong, i * 0.5, s"value_$i"))
      .toDF("id", "v", "s").repartition(7)
    val path = tmp("big.sas7bdat")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path)
    assert(back.count() == n.toLong)
    val agg = back.agg(
      sum("id").cast("long"), sum("v"), count(when(col("s").isNull, 1))).collect()(0)
    assert(agg.getLong(0) == (1 to n).map(_.toLong).sum)
    assert(math.abs(agg.getDouble(1) - (1 to n).map(_ * 0.5).sum) < 1e-6)
    assert(agg.getLong(2) == 0L)
    // partitioned re-read sees the same data as sequential
    val ids = back.select(sum(length(col("s"))).cast("long")).collect()(0).getLong(0)
    assert(ids == (1 to n).map(i => s"value_$i".length.toLong).sum)
  }

  test("labels, formats, and tableName write into the metadata surface") {
    import spark.implicits._
    val df = Seq((1.0, 9.99, "x")).toDF("sex", "price", "tag")
    val path = tmp("meta.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("varLabels", "sex:Respondent sex|tag:A tag")
      .option("varFormats", "price:DOLLAR12.2")
      .option("tableName", "SURVEY")
      .save(path)
    val md = graft.core.sas.SasCore.parse(path)
    assert(md.columns.find(_.name == "sex").get.label == "Respondent sex")
    assert(md.columns.find(_.name == "tag").get.label == "A tag")
    assert(md.columns.find(_.name == "price").get.format == "DOLLAR")
    assert(md.datasetName == "SURVEY")
    val mdf = spark.read.format("readstat-metadata").load(path)
      .select("name", "label", "format").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(mdf("sex").getString(1) == "Respondent sex")
    assert(mdf("price").getString(2) == "DOLLAR")
    // unknown column and string-format both fail loudly
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("varLabels", "nosuch:X").save(tmp("bad1.sas7bdat"))
    }.getMessage.contains("unknown column"))
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("varFormats", "tag:A8").save(tmp("bad2.sas7bdat"))
    }.getMessage.contains("string column"))
  }

  test("wide frame spills metadata across several META pages") {
    import spark.implicits._
    // 3000 columns × 24-char names ≈ 72 KB of name text + 48 KB of
    // attr/name entries — cannot fit one 64 KiB page of subheaders
    val nCols = 3000
    val row = org.apache.spark.sql.Row.fromSeq((0 until nCols).map(_.toDouble))
    val schema = org.apache.spark.sql.types.StructType(
      (0 until nCols).map(i => org.apache.spark.sql.types.StructField(
        f"very_long_column_name_$i%05d",
        org.apache.spark.sql.types.DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row, row), 1), schema)
    val path = tmp("wide.sas7bdat")
    df.write.format("readstat").mode("overwrite").save(path)
    val md = graft.core.sas.SasCore.parse(path)
    assert(md.columns.length == nCols)
    assert(md.columns.head.name == "very_long_column_name_00000")
    assert(md.columns.last.name == f"very_long_column_name_${nCols - 1}%05d")
    val back = spark.read.format("readstat").load(path)
    assert(back.count() == 2L)
    assert(back.select(f"very_long_column_name_${nCols - 1}%05d")
      .collect().map(_.getDouble(0)).toSeq == Seq(nCols - 1.0, nCols - 1.0))
  }

  test("multiFile write: directory of self-contained sas7bdat parts") {
    import spark.implicits._
    val df = (1 to 4000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .repartition(5)
    val dir = tmp("multi.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("multiFile", "true").save(dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("part-\\d{5}\\.sas7bdat")).sortBy(_.getName)
    assert(parts.length == 5)
    val back = spark.read.format("readstat").load(dir)
    assert(back.count() == 4000L)
    assert(back.agg(sum("id").cast("long")).collect()(0).getLong(0) ==
      (1 to 4000).map(_.toLong).sum)
    val one = spark.read.format("readstat").load(parts(0).getAbsolutePath)
    assert(one.count() > 0 && one.columns.toSeq == Seq("id", "s"))
  }

  test("rle-compressed write roundtrips and actually shrinks the file") {
    import spark.implicits._
    // padded strings + repeated values are the classic SAS payload that
    // SASYZCRL exists for: the compressed file must be much smaller and
    // decode identically through the (fixture-proven) RLE reader path
    val n = 20000
    // one 400-byte value forces the char width; every other row is a
    // short tag padded with ~390 trailing blanks — the RLE sweet spot
    val df = (1 to n).map { i =>
      (i.toLong, i % 7 * 1.0, s"tag_${i % 5}",
        if (i == 1) "x" * 400 else s"v$i")
    }.toDF("id", "v", "tag", "s").repartition(3)
    val pU = tmp("plain.sas7bdat")
    val pC = tmp("rle.sas7bdat")
    df.write.format("readstat").mode("overwrite").save(pU)
    df.write.format("readstat").mode("overwrite")
      .option("compression", "rle").save(pC)
    val (szU, szC) = (new java.io.File(pU).length, new java.io.File(pC).length)
    assert(szC < szU / 2, s"rle $szC not < half of $szU")
    val md = graft.core.sas.SasCore.parse(pC)
    assert(md.compression == 1, s"compression=${md.compression}")
    val a = spark.read.format("readstat").load(pU)
    val b = spark.read.format("readstat").load(pC)
    assertSameData(b.orderBy("id"), a.orderBy("id"), "rle-vs-plain")
    assert(b.count() == n.toLong)
    // parallel partitioned re-read of the compressed file agrees too
    assert(b.agg(sum("id").cast("long")).collect()(0).getLong(0) ==
      (1 to n).map(_.toLong).sum)
    // incompressible rows store raw at full row length and still read
    val rnd = new java.util.Random(7)
    val junk = (1 to 500).map { i =>
      val bts = new Array[Byte](24); rnd.nextBytes(bts)
      (i.toDouble, bts.map(x => ((x & 0x3f) + 48).toChar).mkString)
    }.toDF("k", "r")
    val pR = tmp("raw_rows.sas7bdat")
    junk.write.format("readstat").mode("overwrite")
      .option("compression", "rle").save(pR)
    val back = spark.read.format("readstat").load(pR)
    assert(back.count() == 500L)
    assert(back.agg(sum("k")).collect()(0).getDouble(0) == (1 to 500).sum.toDouble)
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("compression", "zstd").save(tmp("bad.sas7bdat"))
    }.getMessage.contains("none|rle"))
  }

  test("valueLabels write a sas7bcat catalog that labels the read-back") {
    import spark.implicits._
    // SAS keeps value labels in a catalog, not the data file: the writer
    // assigns a generated format name and emits the sibling .sas7bcat;
    // the reader's catalog option joins them back — full label roundtrip
    // the reference cannot do in either direction (it only READS catalogs)
    val df = Seq((1.0, "ab", 10.0), (2.0, "cd", 20.0), (1.0, "ab", 30.0))
      .toDF("sex", "tag", "v")
    val path = tmp("labeled.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels", "sex:1=Male,2=Female|tag:ab=Alpha,cd=Delta")
      .save(path)
    val catPath = path.stripSuffix(".sas7bdat") + ".sas7bcat"
    assert(new java.io.File(catPath).isFile, "catalog not written")
    val cat = graft.core.sas.SasCatalog.read(catPath)
    assert(cat.numeric.values.toSeq.contains(Map(1.0 -> "Male", 2.0 -> "Female")),
      cat.numeric.toString)
    assert(cat.string.values.toSeq.contains(Map("ab" -> "Alpha", "cd" -> "Delta")),
      cat.string.toString)
    // the data file references the generated formats
    val md = graft.core.sas.SasCore.parse(path)
    assert(md.columns.find(_.name == "sex").get.format == cat.numeric.keys.head,
      md.columns.map(c => c.name + "=" + c.format).mkString(","))
    assert(md.columns.find(_.name == "v").get.format.isEmpty)
    // end-to-end: the catalog option labels the numeric column
    val back = spark.read.format("readstat")
      .option("catalog", catPath)
      .option("valueLabelsAsStrings", "true").load(path)
    assert(back.select("sex").collect().map(_.getString(0)).toSeq ==
      Seq("Male", "Female", "Male"))
    // a unicode label survives the UTF-8 catalog encoding
    val p2 = tmp("uni.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels", "sex:1=Homme — 男性,2=Femme").save(p2)
    val cat2 = graft.core.sas.SasCatalog.read(
      p2.stripSuffix(".sas7bdat") + ".sas7bcat")
    assert(cat2.numeric.values.head(1.0) == "Homme — 男性")
  }

  test("metadata-df-driven sas7bdat write: labels, formats, value labels flow through") {
    import spark.implicits._
    val src = Seq((1.0, 9.99, "x"), (2.0, 1.5, "y")).toDF("sex", "price", "tag")
    // a sas7bdat metadata frame carries labels + formats but NO value
    // labels (SAS keeps those in the catalog) — so source the frame from
    // a .sav, whose frame surfaces all three: the 12-col frame is
    // format-agnostic by design (reference metadata= write path)
    val p1 = tmp("mdsrc.sav")
    src.write.format("readstat").mode("overwrite")
      .option("varLabels", "sex:Respondent sex")
      .option("valueLabels", "sex:1=Male,2=Female")
      .save(p1)
    val mdPath = tmp("sasmeta.parquet")
    spark.read.format("readstat-metadata").load(p1)
      .write.mode("overwrite").parquet(mdPath)
    val p2 = tmp("mdout.sas7bdat")
    src.write.format("readstat").mode("overwrite")
      .option("metadataPath", mdPath)
      .option("varFormats", "price:DOLLAR12.2") // explicit merges on top
      .save(p2)
    val md = graft.core.sas.SasCore.parse(p2)
    assert(md.columns.find(_.name == "sex").get.label == "Respondent sex")
    assert(md.columns.find(_.name == "price").get.format == "DOLLAR")
    // value labels from the metadata frame regenerate the sibling catalog
    val catPath = p2.stripSuffix(".sas7bdat") + ".sas7bcat"
    assert(new java.io.File(catPath).isFile, "catalog not regenerated")
    val back = spark.read.format("readstat")
      .option("catalog", catPath)
      .option("valueLabelsAsStrings", "true").load(p2)
    assert(back.orderBy("price").select("sex").collect()
      .map(_.getString(0)).toSeq == Seq("Female", "Male"))
    // a dta-style "%9.2f" format string in the frame is dropped, not fatal
    val mdBad = tmp("sasmeta2.parquet")
    spark.read.format("readstat-metadata").load(p1)
      .withColumn("format",
        when(col("name") === "price", lit("%9.2f")).otherwise(col("format")))
      .write.mode("overwrite").parquet(mdBad)
    val p3 = tmp("mdout2.sas7bdat")
    src.write.format("readstat").mode("overwrite")
      .option("metadataPath", mdBad).save(p3)
    assert(graft.core.sas.SasCore.parse(p3)
      .columns.find(_.name == "price").get.format.isEmpty)
  }

  test("sas7bdat tagged missings roundtrip; plain missing has no phantom tag") {
    import spark.implicits._
    val df = Seq(
      (Some(2.5), None: Option[String]),
      (None, Some(".A")),
      (None, None),
      (None, Some("._")),
      (None, Some(".z"))
    ).toDF("v", "v_null")
    val path = tmp("tagged.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("taggedMissings", "v:v_null").save(path)
    val back = spark.read.format("readstat")
      .option("informativeNulls", "true").load(path)
    assert(back.columns.toSeq == Seq("v", "v_null"))
    // regression pin: the old canonical-NaN plain missing decoded as a
    // spurious .F tag — row 3 (no indicator) must read a NULL indicator
    assert(back.select("v_null").collect()
      .map(r => Option(r.getString(0)).orNull).toSeq ==
      Seq(null, ".A", null, "._", ".Z"))
    assert(back.select("v").collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq ==
      Seq(2.5, null, null, null, null))
    // read → write → read fixpoint
    val p2 = tmp("tagged2.sas7bdat")
    back.write.format("readstat").mode("overwrite")
      .option("taggedMissings", "v:v_null").save(p2)
    val back2 = spark.read.format("readstat")
      .option("informativeNulls", "true").load(p2)
    assertSameData(back2, back, "sas-tagged-roundtrip")
    assert(intercept[Exception] {
      Seq((None: Option[Double], Some("NA"))).toDF("v", "v_null")
        .write.format("readstat").mode("overwrite")
        .option("taggedMissings", "v:v_null").save(tmp("badtag.sas7bdat"))
    }.getMessage.contains(".A"))
  }

  test("extension-less sas7bdat write roundtrips via fileFormat + sniff") {
    import spark.implicits._
    val df = Seq((1.0, "a"), (2.0, "b")).toDF("v", "s")
    val p = tmp("staged_sas")
    df.write.format("readstat").mode("overwrite")
      .option("fileFormat", "sas").save(p)
    val back = spark.read.format("readstat").load(p)
    assert(back.count() == 2L)
    assert(back.agg(sum("v")).collect()(0).getDouble(0) == 3.0)
  }

  test("valueLabels on columns named year/month/time stay numeric on read-back") {
    import spark.implicits._
    import org.apache.spark.sql.types.DoubleType
    // generated catalog format names like YEARF/MONTHF/TIMEF would
    // prefix-match SAS temporal formats (kindFor tests startsWith, as
    // ReadStat-family readers do), silently converting the labeled
    // numeric column to a date/time on read-back — the writer Z-prefixes
    // such names so the data file stays plain-numeric
    val df = Seq((1.0, 1.0, 1.0, 1.0), (2.0, 2.0, 2.0, 2.0))
      .toDF("year", "month", "time", "today")
    val path = tmp("temporal_names.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels",
        "year:1=Y1,2=Y2|month:1=Jan,2=Feb|time:1=T1,2=T2|today:1=D1,2=D2")
      .save(path)
    val back = spark.read.format("readstat").load(path)
    assert(back.schema.fields.forall(_.dataType == DoubleType),
      back.schema.treeString)
    assert(back.orderBy("year").collect().map(_.getDouble(0)).toSeq ==
      Seq(1.0, 2.0))
    // the mangled formats still resolve through the sibling catalog
    val catPath = path.stripSuffix(".sas7bdat") + ".sas7bcat"
    val labeled = spark.read.format("readstat").option("catalog", catPath)
      .option("valueLabelsAsStrings", "true").load(path)
    assert(labeled.orderBy("year").select("month").collect()
      .map(_.getString(0)).toSeq == Seq("Jan", "Feb"))
    // same helper feeds the xpt sibling-catalog path
    val xp = tmp("temporal_names.xpt")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels", "year:1=Y1,2=Y2").save(xp)
    val xback = spark.read.format("readstat").load(xp)
    // xpt names are uppercased by the writer
    assert(xback.schema("YEAR").dataType == DoubleType,
      xback.schema.treeString)
  }

  test("rle page geometry fits a raw-stored row just under the page capacity") {
    import spark.implicits._
    // two max-run-free strings totalling 65480 bytes: plain geometry
    // (64 KiB page, 40 B header) fits the fixed row, but an rle
    // raw-stored row also needs its 24-byte subheader pointer — the
    // rle geometry must grow the page instead of failing at write time
    val rnd = new java.util.Random(42)
    def noisy(n: Int): String = {
      val sb = new StringBuilder(n)
      var prev = -1
      while (sb.length < n) {
        val c = 'A' + rnd.nextInt(26)
        if (c != prev) { sb.append(c.toChar); prev = c }
      }
      sb.toString
    }
    val df = Seq((noisy(32740), noisy(32740)), (noisy(32740), noisy(32740)))
      .toDF("a", "b")
    val p = tmp("wide_rle.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("compression", "rle").save(p)
    val back = spark.read.format("readstat").load(p)
    assert(back.count() == 2L)
    assert(back.select(length(col("a"))).collect().map(_.getInt(0)).toSeq ==
      Seq(32740, 32740))
    assertSameData(back, df, "rle-capacity-roundtrip")
  }

  test("storageWidths writes truncated numerics that read back exactly") {
    import spark.implicits._
    // w3 holds ints to 8,192 exactly; w4 to 2,097,152 — the SAS LENGTH
    // bounds. 1.5's mantissa lives in the top bytes, so it survives w4.
    val df = Seq(
      (1, 8192.0, 2097152.0, 1.5, 0.1),
      (2, -8191.0, -2097151.0, -2.25, 123.456),
      (3, 0.0, 42.0, 0.0, 0.0)
    ).toDF("id", "w3", "w4", "w4frac", "w8")
    val path = tmp("widths.sas7bdat")
    df.write.format("readstat").mode("overwrite")
      .option("storageWidths", "w3:3|w4:4|w4frac:4").save(path)
    // declared widths land in the column-attrs metadata and shrink rows
    val md = graft.core.sas.SasCore.parse(path)
    assert(md.columns.find(_.name == "w3").get.length == 3)
    assert(md.columns.find(_.name == "w4").get.length == 4)
    assert(md.columns.find(_.name == "w8").get.length == 8)
    assert(md.rowLength == 8 + 3 + 4 + 4 + 8)
    val rows = spark.read.format("readstat").load(path)
      .orderBy("id").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(8192.0, -8191.0, 0.0))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(2097152.0, -2097151.0, 42.0))
    assert(rows.map(_.getDouble(3)).toSeq == Seq(1.5, -2.25, 0.0))
    assert(rows.map(_.getDouble(4)).toSeq == Seq(0.1, 123.456, 0.0))
    // a value whose mantissa spills past the stored bytes truncates to
    // exactly the reader's zero-fill reconstruction (SAS semantics)
    val p2 = tmp("widths_trunc.sas7bdat")
    Seq(Tuple1(0.1)).toDF("v").write.format("readstat").mode("overwrite")
      .option("storageWidths", "v:4").save(p2)
    val got = spark.read.format("readstat").load(p2).collect()(0).getDouble(0)
    val expect = java.lang.Double.longBitsToDouble(
      java.lang.Double.doubleToLongBits(0.1) & 0xFFFFFFFF00000000L)
    assert(got == expect && got != 0.1)
  }

  test("storageWidths: tags survive truncation; RLE composes; refusals") {
    import spark.implicits._
    // the user-missing tag byte is bits 47:40 — kept at every legal
    // width, which is why SAS's minimum numeric length is 3
    val tagged = Seq(
      (Some(2.5), None: Option[String]),
      (None, Some(".K")),
      (None, None)
    ).toDF("v", "v_null")
    val p = tmp("widths_tagged.sas7bdat")
    tagged.write.format("readstat").mode("overwrite")
      .option("taggedMissings", "v:v_null")
      .option("storageWidths", "v:3").save(p)
    val back = spark.read.format("readstat")
      .option("informativeNulls", "true").load(p)
    assert(back.select("v_null").collect()
      .map(r => Option(r.getString(0)).orNull).toSeq == Seq(null, ".K", null))
    assert(back.select("v").collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq ==
      Seq(2.5, null, null))
    // RLE rows compress the truncated layout
    val p3 = tmp("widths_rle.sas7bdat")
    val big = (1 to 5000).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("id", "v")
    big.write.format("readstat").mode("overwrite")
      .option("compression", "rle")
      .option("storageWidths", "id:6|v:4").save(p3)
    val agg = spark.read.format("readstat").load(p3)
      .agg(sum("id").cast("long"), sum("v")).collect()(0)
    assert(agg.getLong(0) == (1 to 5000).map(_.toLong).sum)
    assert(agg.getDouble(1) == (1 to 5000).map(i => (i % 100).toDouble).sum)
    // refusals: string column, out-of-range width, unknown column
    def fails(opts: (String, String)*): String =
      intercept[Exception] {
        val w = Seq((1.0, "x")).toDF("v", "s").write
          .format("readstat").mode("overwrite")
        opts.foldLeft(w)((b, o) => b.option(o._1, o._2))
          .save(tmp("widths_bad.sas7bdat"))
      }.getMessage
    assert(fails("storageWidths" -> "s:4").contains("string column"))
    assert(fails("storageWidths" -> "v:2").contains("3-8"))
    assert(fails("storageWidths" -> "nope:4").contains("unknown column"))
    // and the cross-format refusal matrix still rejects it elsewhere
    assert(intercept[Exception] {
      Seq(Tuple1(1.0)).toDF("v").write.format("readstat").mode("overwrite")
        .option("storageWidths", "v:4").save(tmp("widths_bad.dta"))
    }.getMessage.toLowerCase.contains("storagewidths"))
  }
}
