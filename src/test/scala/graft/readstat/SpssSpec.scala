package graft.readstat

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SPSS reader/writer: fixture sweep, pinned sample.sav values (from the
  * documented pyreadstat sample schema, reference docs/read.md:276-313),
  * zsav==sav parity, writer roundtrips incl. very-long strings.
  */
class SpssSpec extends SparkTestBase {

  private def fixdir = res("fixtures/spss")

  test("all spss fixtures open and read fully") {
    new File(fixdir).listFiles().toSeq.sortBy(_.getName).foreach { f =>
      val df = spark.read.format("readstat").load(f.getAbsolutePath)
      assert(df.schema.nonEmpty, f.getName)
      assert(df.count() >= 0, f.getName)
    }
  }

  test("sample.sav pinned values") {
    val df = spark.read.format("readstat").load(s"$fixdir/sample.sav")
    assert(df.columns.toSeq ==
      Seq("mychar", "mynum", "mydate", "dtime", "mylabl", "myord", "mytime"))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", "c", "d", "e"))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.1, 1.2, -1000.3, -1.4, 1000.3))
    assert(rows(0).getAs[java.sql.Date](2).toString == "2018-05-06")
    assert(rows(3).getAs[java.sql.Date](2).toString == "1583-01-01")
    assert(rows(4).isNullAt(2) && rows(4).isNullAt(3) && rows(4).isNullAt(6))
    // mytime row0 = 10:10:10 = 36610s in nanos
    assert(rows(0).getLong(6) == 36610L * 1000000000L)
  }

  test("zsav decodes identically to sav") {
    val a = spark.read.format("readstat").load(s"$fixdir/sample.sav")
    val b = spark.read.format("readstat").load(s"$fixdir/sample.zsav")
    assertSameData(b, a, "zsav-vs-sav")
  }

  test("zsav checkpoint-partitioned read equals sequential read") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_zp").toFile
    d.deleteOnExit()
    val path = s"${d.getAbsolutePath}/par.zsav"
    val df = (1 to 20000)
      .map(i => (i.toDouble, s"s$i", if (i % 7 == 0) null else s"t${i % 100}"))
      .toDF("v", "s1", "s2").coalesce(1)
    df.write.format("readstat").mode("overwrite").save(path)
    val serial = spark.read.format("readstat")
      .option("missingStringAsNull", "false").load(path)
    val parallel = spark.read.format("readstat")
      .option("missingStringAsNull", "false")
      .option("partitionTargetBytes", "65536").load(path)
    assert(parallel.rdd.getNumPartitions > 4,
      s"expected checkpointed partitions, got ${parallel.rdd.getNumPartitions}")
    assert(parallel.count() == 20000)
    // same rows regardless of partitioning (order-insensitive compare)
    val a = serial.orderBy("v").collect().map(_.toSeq)
    val b = parallel.orderBy("v").collect().map(_.toSeq)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("reference-produced zsav reads identically under one-row partitions") {
    val path = s"$fixdir/sample.zsav"
    val serial = spark.read.format("readstat").load(path)
    val parallel = spark.read.format("readstat")
      .option("partitionTargetBytes", "8").load(path)
    assert(parallel.rdd.getNumPartitions == 5,
      s"expected 5 partitions, got ${parallel.rdd.getNumPartitions}")
    assertSameData(parallel.orderBy("mynum"), serial.orderBy("mynum"),
      "ref-zsav-checkpoint")
  }

  test("bytecode sav checkpoint-partitioned read equals sequential read") {
    // sample.sav is bytecode-compressed (compression=1); a tiny partition
    // target forces one-row partitions, each resuming from a checkpoint
    val path = s"$fixdir/sample.sav"
    val serial = spark.read.format("readstat").load(path)
    val parallel = spark.read.format("readstat")
      .option("partitionTargetBytes", "8").load(path)
    assert(parallel.rdd.getNumPartitions == 5,
      s"expected 5 one-row partitions, got ${parallel.rdd.getNumPartitions}")
    assertSameData(parallel.orderBy("mynum"), serial.orderBy("mynum"),
      "bytecode-checkpoint")
  }

  test("value labels as strings on labelled-num") {
    val df = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(s"$fixdir/labelled-num.sav")
    val v = df.collect()(0).getString(0)
    assert(v != null && v.nonEmpty && !v.forall(_.isDigit), s"expected label, got $v")
  }

  test("declared missing values become null + indicator") {
    val plain = spark.read.format("readstat").load(s"$fixdir/sample_missing.sav")
    assert(plain.count() > 0)
    val info = spark.read.format("readstat")
      .option("informativeNulls", "true").load(s"$fixdir/sample_missing.sav")
    assert(info.columns.exists(_.endsWith("_null")))
  }

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft_sav").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name"
  }

  test("sav long-string value labels roundtrip via subtype 21") {
    import spark.implicits._
    // mirrors the reference's long-string value label fixtures
    // (tests/test_spss_long_string_value_labels.py: basic / multi-vars /
    // unicode): 300-wide segmented strings AND a 20-wide (>8, single
    // segment) string, labels > 255 bytes with non-Latin characters —
    // neither fits the 8-byte type-3 value slot, so both must travel in
    // the subtype-21 record (metadata.rs:725-801)
    val aVals = Seq("A" * 300, "B" * 300, "C" * 300)
    val bVals = Seq("X" * 20, "Y" * 20, "Z" * 20)
    val df = aVals.zip(bVals).zipWithIndex
      .map { case ((a, b), i) => (a, b, i.toDouble) }
      .toDF("longstr_a", "longstr_b", "id")
    val label = "Label_" + "L" * 260 + " Café — 測試"
    val path = tmp("lsvl.sav")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels",
        s"longstr_a:${"A" * 300}=$label|longstr_b:${"X" * 20}=LabelB")
      .save(path)
    val meta = graft.core.spss.SpssCore.parse(path)
    val va = meta.vars.find(_.name == "longstr_a").get
    assert(va.strLabels("A" * 300) == label)
    assert(va.valueLabelName.isDefined)
    val vb = meta.vars.find(_.name == "longstr_b").get
    assert(vb.strLabels("X" * 20) == "LabelB")
    // the labelled read switch maps values through the long-string map
    val back = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(path)
    assert(back.select("longstr_a").collect().map(_.getString(0)).toSeq ==
      Seq(label, "B" * 300, "C" * 300))
    assert(back.select("longstr_b").collect().map(_.getString(0)).toSeq ==
      Seq("LabelB", "Y" * 20, "Z" * 20))
  }

  test("sav short-string value labels land in standard type-3 records") {
    import spark.implicits._
    // ≤8-byte string values fit the raw 8-byte type-3 slot (space
    // padded) — no subtype 21 involved; the reference READER handles
    // these via the normal label records, its writer refuses them
    val df = Seq(("ab", 1.0), ("cd", 2.0), ("ab", 3.0)).toDF("code", "x")
    val path = tmp("ssvl.sav")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels", "code:ab=Alpha,cd=Delta").save(path)
    val meta = graft.core.spss.SpssCore.parse(path)
    val v = meta.vars.find(_.name == "code").get
    assert(v.strLabels == Map("ab" -> "Alpha", "cd" -> "Delta"))
    val back = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(path)
    assert(back.select("code").collect().map(_.getString(0)).toSeq ==
      Seq("Alpha", "Delta", "Alpha"))
    // over-width code fails loudly instead of writing a corrupt slot
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("valueLabels", "code:abcdefghi=TooWide").save(tmp("bad.sav"))
    }.getMessage.contains("exceeds"))
  }

  test("sav long-string missing values (subtype 22) null out declared codes") {
    import spark.implicits._
    // our writer doesn't emit subtype 22 (neither does the reference's);
    // splice a hand-built record before the dictionary terminator to
    // exercise the READ path the reference has (metadata.rs:804-853)
    val miss = "N" * 16
    val df = Seq(("D" * 16, 1.0), (miss, 2.0), ("E" * 16, 3.0)).toDF("s", "x")
    val path = tmp("lsmv.sav")
    df.write.format("readstat").mode("overwrite").save(path)
    val orig = Files.readAllBytes(java.nio.file.Paths.get(path))
    val dictEnd = graft.core.spss.SpssCore.parse(path).dataOffset.toInt - 8
    val payload = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      payload.write(v & 0xff); payload.write((v >> 8) & 0xff)
      payload.write((v >> 16) & 0xff); payload.write((v >> 24) & 0xff)
    }
    u32(1); payload.write('s') // pascal name
    payload.write(1)           // one missing value
    u32(16)                    // shared value length
    payload.write(miss.getBytes("US-ASCII"))
    val rec = new java.io.ByteArrayOutputStream()
    val w = new java.io.DataOutputStream(rec)
    def r32(v: Int): Unit = { // LE
      w.write(v & 0xff); w.write((v >> 8) & 0xff)
      w.write((v >> 16) & 0xff); w.write((v >> 24) & 0xff)
    }
    r32(7); r32(22); r32(1); r32(payload.size())
    rec.write(payload.toByteArray)
    val patched = new java.io.ByteArrayOutputStream()
    patched.write(orig, 0, dictEnd)
    patched.write(rec.toByteArray)
    patched.write(orig, dictEnd, orig.length - dictEnd)
    val p2 = tmp("lsmv_patched.sav")
    Files.write(java.nio.file.Paths.get(p2), patched.toByteArray)
    val back = spark.read.format("readstat").load(p2).collect()
    assert(back(0).getString(0) == "D" * 16)
    assert(back(1).isNullAt(0), "declared long-string missing must read as null")
    assert(back(2).getString(0) == "E" * 16)
    // and the declared missing surfaces through informative nulls
    val info = spark.read.format("readstat")
      .option("informativeNulls", "true").load(p2)
    val nullCol = info.columns.find(_ == "s_null")
    assert(nullCol.isDefined, info.columns.mkString(","))
    assert(info.collect()(1).getAs[String]("s_null") != null)
  }

  test("all-types roundtrip through sav") {
    import spark.implicits._
    val df = Seq(
      (1, 1.5, "alpha", java.sql.Date.valueOf("2020-01-02"),
        java.sql.Timestamp.valueOf("2021-03-04 05:06:07.0")),
      (2, -2.25, "", java.sql.Date.valueOf("1959-12-31"), null)
    ).toDF("id", "x", "s", "d", "ts")
    val path = tmp("rt.sav")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat")
      .option("missingStringAsNull", "false").load(path)
    val want = df
      .withColumn("id", col("id").cast(DoubleType))
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    assertSameData(back, want, "sav-all-types")
  }

  test("very long strings roundtrip through sav segments") {
    import spark.implicits._
    val big = ("paragraph " * 120).trim // ~1200 bytes > 255
    val df = Seq((1, big), (2, "short"), (3, "x" * 255)).toDF("id", "txt")
    val path = tmp("long.sav")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path).orderBy("id")
    val got = back.select("txt").collect().map(_.getString(0))
    assert(got(0) == big, s"len ${got(0).length} vs ${big.length}")
    assert(got(1) == "short")
    assert(got(2) == "x" * 255)
  }

  test("sav multi-partition write + parallel re-read") {
    import spark.implicits._
    val df = (1 to 20000).map(i => (i.toDouble, s"name$i")).toDF("v", "s")
      .repartition(5)
    val path = tmp("multi.sav")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat")
      .option("partitionTargetBytes", "65536").load(path)
    assert(back.rdd.getNumPartitions > 1)
    assert(back.count() == 20000)
    assert(back.agg(sum("v")).collect()(0).getDouble(0) ==
      (1 to 20000).map(_.toDouble).sum)
  }

  test("cross-format: same frame through dta and sav reads back equal") {
    import spark.implicits._
    val df = Seq(
      (1.0, "a", java.sql.Date.valueOf("2001-02-03")),
      (2.0, "b", java.sql.Date.valueOf("1995-06-07"))
    ).toDF("x", "s", "d")
    val p1 = tmp("x.dta"); val p2 = tmp("x.sav")
    df.write.format("readstat").mode("overwrite").save(p1)
    df.write.format("readstat").mode("overwrite").save(p2)
    val a = spark.read.format("readstat").load(p1)
    val b = spark.read.format("readstat").load(p2)
    assertSameData(b, a, "dta-vs-sav")
  }

  test("sav value labels write + labelled read back") {
    import spark.implicits._
    val df = Seq((1.0, "x"), (2.0, "y"), (1.0, "z")).toDF("sex", "s")
    val path = tmp("lab.sav")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels", "sex:1=Male,2=Female").save(path)
    val back = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(path)
    assert(back.select("sex").collect().map(_.getString(0)).toSeq ==
      Seq("Male", "Female", "Male"))
  }

  test("sav variable labels write + read back, numeric and segmented strings") {
    import spark.implicits._
    // a >255-byte string forces segmentation: the label must attach to
    // the FIRST segment's record only, and pyreadstat-style readers
    // (and ours) surface it on the reassembled column
    val long = "z" * 300
    val df = Seq((1.0, "ab", long)).toDF("sex", "s", "txt")
    val path = tmp("varlab.sav")
    df.write.format("readstat").mode("overwrite")
      .option("varLabels", "sex:Respondent sex|txt:Long free text")
      .save(path)
    val back = spark.read.format("readstat").load(path)
    assert(back.schema("sex").metadata.getString("readstat.label") ==
      "Respondent sex")
    assert(back.schema("txt").metadata.getString("readstat.label") ==
      "Long free text")
    assert(!back.schema("s").metadata.contains("readstat.label"))
    // data is unharmed by the variable-record layout change
    val r = back.collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getString(1) == "ab" &&
      r.getString(2) == long)
  }

  test("sav varMeasures writes subtype-11 display params (measure/width/align)") {
    import spark.implicits._
    // the >255-byte string writes TWO segment variables: the subtype-11
    // record must carry one triple per dictionary variable (segments
    // count), or external readers misalign every following column
    val df = Seq((1.0, "z" * 300, 3.0, "ab")).toDF("rating", "txt", "income", "s")
    val path = tmp("measures.sav")
    df.write.format("readstat").mode("overwrite")
      .option("varMeasures", "rating:ordinal|income:scale")
      .save(path)
    val md = spark.read.format("readstat-metadata").load(path)
      .select("name", "measure", "alignment").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(md("rating") == (("Ordinal", "Right")))
    assert(md("income") == (("Scale", "Right")))
    // undeclared string columns get the SPSS default nominal + left —
    // including the ones AFTER the segmented string
    assert(md("txt") == (("Nominal", "Left")))
    assert(md("s") == (("Nominal", "Left")))
    // typo'd measure value and unknown column fail before any job runs
    assert(intercept[IllegalArgumentException] {
      df.write.format("readstat").mode("overwrite")
        .option("varMeasures", "rating:ordnial").save(tmp("m1.sav"))
    }.getMessage.contains("nominal|ordinal|scale"))
    assert(intercept[IllegalArgumentException] {
      df.write.format("readstat").mode("overwrite")
        .option("varMeasures", "ratng:ordinal").save(tmp("m2.sav"))
    }.getMessage.contains("unknown column"))
  }

  test("sav varFormats writes custom print formats; DATE formats type the read") {
    import spark.implicits._
    val df = Seq((12.5, 19723.0)).toDF("price", "d")
    val path = tmp("fmt.sav")
    df.write.format("readstat").mode("overwrite")
      .option("varFormats", "price:DOLLAR12.2")
      .save(path)
    val md = spark.read.format("readstat-metadata").load(path)
      .select("name", "format_type", "format_width", "format_decimals")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(md("price") == ((4, 12, 2))) // DOLLAR
    assert(md("d") == ((5, 8, 2)))      // derived F8.2 default
    assert(spark.read.format("readstat").load(path)
      .collect()(0).getDouble(0) == 12.5)
    // unknown format name is rejected with the supported list
    val e = intercept[IllegalArgumentException] {
      df.write.format("readstat").mode("overwrite")
        .option("varFormats", "price:BOGUS9").save(tmp("fmtbad.sav"))
    }
    assert(e.getMessage.contains("unknown format"))
  }

  test("metadata-df-driven sav write: labels, measures, formats flow through") {
    import spark.implicits._
    // 1. write a sav carrying the full metadata surface
    val src = Seq((1.0, 9.99, "a"), (2.0, 12.5, "bb")).toDF("sex", "price", "tag")
    val p1 = tmp("meta_src.sav")
    src.write.format("readstat").mode("overwrite")
      .option("valueLabels", "sex:1=Male,2=Female")
      .option("varLabels", "sex:Respondent sex|price:Unit price")
      .option("varMeasures", "sex:nominal")
      .option("varFormats", "price:DOLLAR12.2")
      .option("varDisplayWidths", "sex:14")
      .option("varAlignments", "sex:center")
      .save(p1)
    // 2. dump its metadata frame, write a NEW sav from metadataPath alone
    val mdPath = tmp("meta.parquet")
    spark.read.format("readstat-metadata").load(p1)
      .write.mode("overwrite").parquet(mdPath)
    val p2 = tmp("meta_out.sav")
    src.write.format("readstat").mode("overwrite")
      .option("metadataPath", mdPath).save(p2)
    // 3. the whole surface survives the round
    val md = spark.read.format("readstat-metadata").load(p2)
      .select("name", "label", "measure", "format_type", "format_width",
        "format_decimals", "value_label_codes")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(md("sex").getString(1) == "Respondent sex")
    assert(md("price").getString(1) == "Unit price")
    assert(md("sex").getString(2) == "Nominal")
    assert((md("price").getInt(3), md("price").getInt(4), md("price").getInt(5))
      == ((4, 12, 2)), "DOLLAR12.2 lost")
    assert(!md("sex").isNullAt(6) && md("sex").getSeq[String](6).nonEmpty)
    // display width + alignment ride the metadata frame too (reference:
    // "metadata= carries over ... measure, alignment, display width")
    val v2 = graft.core.spss.SpssCore.parse(p2).vars.find(_.name == "sex").get
    assert(v2.displayWidth.contains(14), v2.displayWidth.toString)
    assert(v2.alignment.exists(_.equalsIgnoreCase("center")), v2.alignment.toString)
    val lbl = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(p2)
      .select("sex").collect().map(_.getString(0)).toSeq
    assert(lbl == Seq("Male", "Female"))
    // explicit option still wins over the metadata entry
    val p3 = tmp("meta_win.sav")
    src.write.format("readstat").mode("overwrite")
      .option("metadataPath", mdPath)
      .option("varLabels", "sex:Override label").save(p3)
    val l3 = spark.read.format("readstat-metadata").load(p3)
      .filter(col("name") === "sex").select("label").collect()(0).getString(0)
    assert(l3 == "Override label")
  }

  test("sav varDisplayWidths + varAlignments write subtype-11 params") {
    import spark.implicits._
    // reference variable_display_width / variable_alignment write dicts
    // (docs/write.md:58-59); SPSS codes: 0 left, 1 right, 2 centre
    val df = Seq((1.0, "ab"), (2.0, "cd")).toDF("x", "s")
    val path = tmp("dispal.sav")
    df.write.format("readstat").mode("overwrite")
      .option("varDisplayWidths", "x:15|s:7")
      .option("varAlignments", "x:center|s:right")
      .save(path)
    val meta = graft.core.spss.SpssCore.parse(path)
    val vx = meta.vars.find(_.name == "x").get
    val vs = meta.vars.find(_.name == "s").get
    assert(vx.displayWidth.contains(15) && vs.displayWidth.contains(7))
    assert(vx.alignment.contains("Center") || vx.alignment.exists(_.equalsIgnoreCase("center")),
      vx.alignment.toString)
    assert(vs.alignment.exists(_.equalsIgnoreCase("right")), vs.alignment.toString)
    // defaults still apply to undeclared columns when only one is set
    val p2 = tmp("dispal2.sav")
    df.write.format("readstat").mode("overwrite")
      .option("varDisplayWidths", "x:9").save(p2)
    val m2 = graft.core.spss.SpssCore.parse(p2)
    assert(m2.vars.find(_.name == "x").get.displayWidth.contains(9))
    assert(m2.vars.find(_.name == "s").get.alignment.exists(_.equalsIgnoreCase("left")))
    // bad values fail loudly
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("varAlignments", "x:middle").save(tmp("bad_al.sav"))
    }.getMessage.contains("left|right|center"))
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("varDisplayWidths", "x:wide").save(tmp("bad_dw.sav"))
    }.getMessage.contains("integer"))
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("varDisplayWidths", "nosuch:9").save(tmp("bad_col.sav"))
    }.getMessage.contains("unknown column"))
  }

  test("string value labels survive a metadata-df roundtrip") {
    import spark.implicits._
    // sav → metadata frame → new sav driven by metadataPath alone: the
    // string-coded labels (long-string subtype 21 included) must carry
    // over, while the dta writer narrows the same frame to its numeric
    // entries instead of corrupting them
    // x is integer: Stata value labels attach to integer storage only
    val df = Seq(("Y" * 12, 1), ("N" * 12, 2)).toDF("s", "x")
    val p1 = tmp("strvl_src.sav")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels", s"s:${"Y" * 12}=Yes,${"N" * 12}=No|x:1=One")
      .save(p1)
    val mdPath = tmp("strvl_meta.parquet")
    spark.read.format("readstat-metadata").load(p1)
      .write.mode("overwrite").parquet(mdPath)
    val p2 = tmp("strvl_out.sav")
    df.write.format("readstat").mode("overwrite")
      .option("metadataPath", mdPath).save(p2)
    val v = graft.core.spss.SpssCore.parse(p2).vars.find(_.name == "s").get
    assert(v.strLabels == Map(("Y" * 12) -> "Yes", ("N" * 12) -> "No"))
    val vx = graft.core.spss.SpssCore.parse(p2).vars.find(_.name == "x").get
    assert(vx.numLabels == Map(1.0 -> "One"))
    // same frame through the dta writer: numeric labels only, no throw
    val p3 = tmp("strvl_out.dta")
    df.write.format("readstat").mode("overwrite")
      .option("metadataPath", mdPath).save(p3)
    val back = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(p3)
    assert(back.select("x").collect().map(_.getString(0)).toSeq ==
      Seq("One", "2"))
  }

  test("write-side declared missing values roundtrip (discrete, range, strings)") {
    import spark.implicits._
    // the reference writer has no missing-value surface; ours writes the
    // var-record fields (numerics + ≤8-byte strings) and a subtype-22
    // record (wider strings) that our reader — and SPSS — honor
    val df = Seq(
      (10.0, "ok", "G" * 12),
      (-99.0, "NA", "M" * 12),
      (-95.0, "xx", "R" * 12),
      (2.0, "ok", "fine")
    ).toDF("v", "s", "ls")
    val path = tmp("declmiss.sav")
    df.write.format("readstat").mode("overwrite")
      .option("missingValues", s"v:-99,-98..-90|s:NA|ls:${"M" * 12}")
      .save(path)
    val meta = graft.core.spss.SpssCore.parse(path)
    val vv = meta.vars.find(_.name == "v").get
    assert(vv.missingRange && vv.missingDoubles == Vector(-98.0, -90.0, -99.0),
      vv.missingDoubles.toString)
    assert(meta.vars.find(_.name == "s").get.missingStrings == Vector("NA"))
    assert(meta.vars.find(_.name == "ls").get.missingStrings ==
      Vector("M" * 12), "subtype-22 long-string missing lost")
    // declared missings null out on read (range hit -95, discrete -99)
    val back = spark.read.format("readstat").load(path).collect()
    def vAt(i: Int): Any = if (back(i).isNullAt(0)) null else back(i).getDouble(0)
    assert(Seq(vAt(0), vAt(1), vAt(2), vAt(3)) == Seq(10.0, null, null, 2.0))
    assert(back.map(r => Option(r.getString(1)).orNull).toSeq ==
      Seq("ok", null, "xx", "ok"))
    assert(back.map(r => Option(r.getString(2)).orNull).toSeq ==
      Seq("G" * 12, null, "R" * 12, "fine"))
    // malformed specs fail loudly
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("missingValues", "v:1,2,3,4").save(tmp("mv4.sav"))
    }.getMessage.contains("at most 3"))
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("missingValues", "s:a..z").save(tmp("mvr.sav"))
    }.getMessage.contains("not numeric"))
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("missingValues", "nosuch:1").save(tmp("mvc.sav"))
    }.getMessage.contains("unknown column"))
  }

  test("zsav write roundtrips through our zsav reader") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toDouble, s"row$i", i % 7))
      .toDF("v", "s", "g").repartition(3)
    val path = tmp("rt.zsav")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path)
    assert(back.count() == 5000)
    import org.apache.spark.sql.functions._
    val sums = back.agg(sum("v"), sum("g")).collect()(0)
    assert(sums.getDouble(0) == (1 to 5000).map(_.toDouble).sum)
    assert(sums.getDouble(1) == (1 to 5000).map(_ % 7).sum.toDouble)
    // strings survive bytecode+zlib roundtrip
    val s1 = back.filter(col("v") === 1.0).select("s").collect()(0).getString(0)
    assert(s1 == "row1")
  }

  test("timeAsTimeType surfaces Spark 4.1 TIME columns (opt-in)") {
    val df = spark.read.format("readstat")
      .option("timeAsTimeType", "true").load(s"$fixdir/sample.sav")
    assert(df.schema("mytime").dataType ==
      org.apache.spark.sql.types.TimeType(6))
    // collect() of TIME is still gated in Spark 4.1; string-cast works
    val s = df.selectExpr("cast(mytime as string) AS t").collect()
      .map(r => Option(r.getString(0)).orNull)
    assert(s(0) == "10:10:10", s.mkString(","))
    assert(s(4) == null)
  }

  test("multiFile write: directory of self-contained sav and zsav parts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 4000).map(i => (i.toLong, s"v$i", i * 0.5))
      .toDF("id", "s", "v").repartition(5)
    for (ext <- Seq("sav", "zsav")) {
      val dir = java.nio.file.Files.createTempDirectory("graft_msav").toString + s"/multi.$ext"
      df.write.format("readstat").mode("overwrite")
        .option("multiFile", "true").save(dir)
      val parts = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      assert(parts.length == 5, s"$ext: ${parts.length} parts")
      assert(parts.forall(_.getName.endsWith(s".$ext")))
      val back = spark.read.format("readstat").load(dir)
      assert(back.count() == 4000L, ext)
      assert(back.agg(sum("v").cast("double")).collect()(0).getDouble(0) ==
        (1 to 4000).map(_ * 0.5).sum, ext)
      // each part stands alone with a consistent header row count
      val one = spark.read.format("readstat").load(parts(0).getAbsolutePath)
      assert(one.count() > 0 && one.columns.toSeq == Seq("id", "s", "v"), ext)
    }
  }
}
