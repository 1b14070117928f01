package graft.readstat

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Writer roundtrips: our writer → our reader, dtype-normalized equality
  * (mirrors reference tests/test_write_roundtrip.py).
  */
class StataWriterSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft_wt").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name"
  }

  test("all-types roundtrip through dta") {
    import spark.implicits._
    val df = Seq(
      (1.toByte, 10.toShort, 100, 1000L, 1.5f, 2.5, "abc",
        java.sql.Date.valueOf("2020-06-01"),
        java.sql.Timestamp.valueOf("2021-01-02 03:04:05.678"), true),
      (-2.toByte, -20.toShort, -200, -2000L, -1.5f, -2.5, "",
        java.sql.Date.valueOf("1959-01-01"),
        java.sql.Timestamp.valueOf("1900-01-01 00:00:00.0"), false)
    ).toDF("b", "i", "l", "ll", "f", "d", "s", "dt", "ts", "bool")
    val path = tmp("all.dta")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat")
      .option("missingStringAsNull", "false").load(path)
    // LongType → double, BooleanType → byte by dta storage rules
    val want = df
      .withColumn("ll", col("ll").cast(DoubleType))
      .withColumn("bool", col("bool").cast(ByteType))
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    assertSameData(back, want, "all-types")
  }

  test("nulls roundtrip as missing") {
    val schema = StructType(Seq(
      StructField("x", DoubleType), StructField("n", IntegerType),
      StructField("s", StringType)))
    val rows = Seq(Row(1.5, 1, "a"), Row(null, null, null), Row(3.0, 3, "c"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 2), schema)
    val path = tmp("nulls.dta")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path).orderBy(asc_nulls_last("x"))
    val got = back.collect()
    assert(got.length == 3)
    assert(got(2).isNullAt(0) && got(2).isNullAt(1) && got(2).isNullAt(2))
  }

  test("long strings become strL and roundtrip") {
    import spark.implicits._
    val big = "x" * 5000 + "é"
    val df = Seq((1, big), (2, "short"), (3, null.asInstanceOf[String]))
      .toDF("id", "txt")
    val path = tmp("strl.dta")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path).orderBy("id")
    val got = back.select("txt").collect().map(r => Option(r.getString(0)).orNull)
    assert(got(0) == big)
    assert(got(1) == "short")
    assert(got(2) == null)
  }

  test("multi-partition write preserves all rows") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i, s"row$i", i * 0.5)).toDF("id", "s", "v")
      .repartition(7)
    val path = tmp("multi.dta")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path)
    assert(back.count() == 10000)
    val sums = back.agg(sum("id"), sum("v")).collect()(0)
    assert(sums.getLong(0) == (1 to 10000).map(_.toLong).sum)
    assert(sums.getDouble(1) == (1 to 10000).map(_ * 0.5).sum)
  }

  test("catalyst relational flow over readstat scan (minimum slice)") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 50, i * 1.0, s"g${i % 7}"))
      .toDF("age", "income", "grp")
    val path = tmp("rel.dta")
    df.write.format("readstat").mode("overwrite").save(path)
    val scan = spark.read.format("readstat").load(path)
    val out = scan.select("age", "income")
      .filter($"age" >= 18).groupBy("age").count().orderBy("age")
    val expected = df.select("age", "income")
      .filter($"age" >= 18).groupBy("age").count().orderBy("age")
    assertSameData(out, expected, "catalyst-flow")
  }

  test("value labels write + read roundtrip; pandas reads them too") {
    import spark.implicits._
    val df = Seq((1, 10.0), (2, 20.0), (1, 30.0), (3, 40.0)).toDF("sex", "v")
    val path = tmp("labels.dta")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels", "sex:1=Male,2=Female,3=Other")
      .save(path)
    val back = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(path)
    val got = back.select("sex").collect().map(_.getString(0)).toSeq
    assert(got == Seq("Male", "Female", "Male", "Other"))
    // unlabeled read keeps numeric type
    val plain = spark.read.format("readstat").load(path)
    assert(plain.schema("sex").dataType == org.apache.spark.sql.types.IntegerType)
  }

  test("metadata-df-driven write: labels flow file -> metadata -> new file") {
    import spark.implicits._
    // 1. read metadata of a labeled fixture, save as parquet
    val mdf = spark.read.format("readstat-metadata")
      .load(getClass.getClassLoader.getResource("fixtures/stata/stata14_118.dta").getPath)
    val mdPath = tmp("meta.parquet")
    mdf.write.mode("overwrite").parquet(mdPath)
    // 2. write a new frame reusing that metadata
    val df = Seq((0, 1.0), (4, 2.0)).toDF("Bytes", "x")
    val outPath = tmp("meta.dta")
    df.write.format("readstat").mode("overwrite")
      .option("metadataPath", mdPath).save(outPath)
    // 3. labels and variable labels round back
    val back = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(outPath)
    val vals = back.select("Bytes").collect().map(_.getString(0)).toSeq
    assert(vals == Seq("option a", "4"), vals.toString)
  }

  test("varLabels option writes variable labels (reference variable_labels dict)") {
    import spark.implicits._
    val df = Seq((1.0, 2.0)).toDF("income", "age")
    val p = tmp("varlabels.dta")
    df.write.format("readstat").mode("overwrite")
      .option("varLabels", "income:Household income|age:Age in years")
      .save(p)
    val back = spark.read.format("readstat").load(p)
    def label(c: String): String =
      back.schema(c).metadata.getString("readstat.label")
    assert(label("income") == "Household income")
    assert(label("age") == "Age in years")
  }

  test("varFormats option overrides per-variable display formats") {
    import spark.implicits._
    val df = Seq((12.5, 3.0)).toDF("price", "n")
    val p = tmp("varformats.dta")
    df.write.format("readstat").mode("overwrite")
      .option("varFormats", "price:%9.2f")
      .save(p)
    val md = spark.read.format("readstat-metadata").load(p)
      .select("name", "format").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(md("price") == "%9.2f")
    assert(md("n") == "%10.0g") // derived default untouched
    // data decodes regardless of display format
    val r = spark.read.format("readstat").load(p).collect()(0)
    assert(r.getDouble(0) == 12.5 && r.getDouble(1) == 3.0)
    // a non-% string is rejected before any bytes land
    val e = intercept[IllegalArgumentException] {
      df.write.format("readstat").mode("overwrite")
        .option("varFormats", "price:9.2f").save(tmp("bad.dta"))
    }
    assert(e.getMessage.contains("varFormats"))
  }

  test("values in Stata missing ranges promote the storage type (no corruption)") {
    import spark.implicits._
    // byte 101..127 collide with .a-.z sentinels; short >= 32741 with int
    // sentinels; int >= 2147483621 with long sentinels. The writer must
    // widen the storage type instead of writing raw (reference: writer.rs
    // write_i8/i16/i32 NumericOutOfRange).
    val df = Seq(
      (101.toByte, 32750.toShort, 2147483621, 1),
      (-128.toByte, -32768.toShort, -2147483648, 2),
      (5.toByte, 7.toShort, 9, 3)
    ).toDF("b", "s", "i", "id")
    val path = tmp("promote.dta")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path).orderBy("id")
    // byte→int storage reads back ShortType; short→long reads IntegerType;
    // int→double reads DoubleType
    assert(back.schema("b").dataType == ShortType)
    assert(back.schema("s").dataType == IntegerType)
    assert(back.schema("i").dataType == DoubleType)
    val got = back.collect()
    assert(got.map(_.getShort(0)).toSeq == Seq(101, -128, 5).map(_.toShort))
    assert(got.map(_.getInt(1)).toSeq == Seq(32750, -32768, 7))
    assert(got.map(_.getDouble(2)).toSeq ==
      Seq(2147483621d, -2147483648d, 9d))
  }

  test("in-range integer columns keep their natural storage type") {
    import spark.implicits._
    val df = Seq((100.toByte, 32740.toShort, 2147483620, 1),
      (-127.toByte, -32767.toShort, -2147483647, 2)).toDF("b", "s", "i", "id")
    val path = tmp("nopromote.dta")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path).orderBy("id")
    assert(back.schema("b").dataType == ByteType)
    assert(back.schema("s").dataType == ShortType)
    assert(back.schema("i").dataType == IntegerType)
    val got = back.collect()
    assert(got.map(_.getByte(0)).toSeq == Seq(100.toByte, -127.toByte))
    assert(got.map(_.getShort(1)).toSeq == Seq(32740.toShort, -32767.toShort))
    assert(got.map(_.getInt(2)).toSeq == Seq(2147483620, -2147483647))
  }

  test("dtaVersion=119 writes a wide-format file that roundtrips") {
    import spark.implicits._
    val df = Seq((1, 1.5, "abc", "x" * 3000), (2, -2.5, "de", "y"))
      .toDF("id", "v", "s", "big")
    val path = tmp("v119.dta")
    df.write.format("readstat").mode("overwrite")
      .option("dtaVersion", "119").save(path)
    val md = graft.core.stata.StataParser.parse(path)
    assert(md.version == 119)
    val back = spark.read.format("readstat")
      .option("missingStringAsNull", "false").load(path).orderBy("id")
    val got = back.collect()
    assert(got.length == 2)
    assert(got(0).getInt(0) == 1 && got(0).getString(2) == "abc")
    assert(got(0).getString(3) == "x" * 3000) // strL under 119
    assert(got(1).getDouble(1) == -2.5)
    // default stays 118 below the variable-count threshold
    val path118 = tmp("v118.dta")
    df.write.format("readstat").mode("overwrite").save(path118)
    assert(graft.core.stata.StataParser.parse(path118).version == 118)
  }

  test("dtaVersion=117 writes xmlish legacy layout that roundtrips") {
    import spark.implicits._
    // covers all storage classes incl. strL (>2045 bytes) and value labels;
    // é exercises the windows-1252 transcoding of pre-118 strings
    val df = Seq(
      (1, 1.5, "café", "x" * 3000, java.sql.Date.valueOf("2020-06-01"), 1),
      (2, -2.5, "de", "y", java.sql.Date.valueOf("1959-12-31"), 2))
      .toDF("id", "v", "s", "big", "dt", "code")
    val path = tmp("v117.dta")
    df.write.format("readstat").mode("overwrite")
      .option("dtaVersion", "117")
      .option("valueLabels", "code:1=One,2=Two").save(path)
    val md = graft.core.stata.StataParser.parse(path)
    assert(md.version == 117)
    assert(md.valueLabels.exists(_.mapping == Map(1 -> "One", 2 -> "Two")))
    val back = spark.read.format("readstat")
      .option("missingStringAsNull", "false").load(path).orderBy("id")
    val got = back.collect()
    assert(got.length == 2)
    assert(got(0).getString(2) == "café") // survived 1252 roundtrip
    assert(got(0).getString(3) == "x" * 3000)  // strL with u32 refs
    assert(got(0).getDate(4) == java.sql.Date.valueOf("2020-06-01"))
    assert(got(1).getDouble(1) == -2.5)
  }

  test("dtaVersion=114 writes the pre-xml binary layout that roundtrips") {
    import spark.implicits._
    val df = Seq(
      (1, 1.5f, 2.5, "café", 10.toShort, 3.toByte,
        java.sql.Date.valueOf("2020-06-01"), 1),
      (2, -1.5f, -2.5, "s" * 244, (-20).toShort, (-4).toByte,
        java.sql.Date.valueOf("1959-12-31"), 2))
      .toDF("id", "f", "d", "s", "i", "b", "dt", "code")
    val path = tmp("v114.dta")
    df.write.format("readstat").mode("overwrite")
      .option("dtaVersion", "114")
      .option("valueLabels", "code:1=One,2=Two").save(path)
    val md = graft.core.stata.StataParser.parse(path)
    assert(md.version == 114)
    assert(md.nObs == 2 && md.nVars == 8)
    assert(md.valueLabels.exists(_.mapping == Map(1 -> "One", 2 -> "Two")))
    val back = spark.read.format("readstat")
      .option("missingStringAsNull", "false").load(path).orderBy("id")
    val got = back.collect()
    assert(got.length == 2)
    assert(got(0).getString(3) == "café")
    assert(got(1).getString(3) == "s" * 244) // max 114 string width
    assert(got(0).getDate(6) == java.sql.Date.valueOf("2020-06-01"))
    assert(got(1).getByte(5) == -4.toByte)
    // nulls map to the version's missing sentinels and read back as null
    val withNulls = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, null, "a"), Row(2, 5.0, null)).toIndexedSeq, 1),
      StructType(Seq(StructField("id", IntegerType),
        StructField("x", DoubleType), StructField("s", StringType))))
    val p2 = tmp("v114_nulls.dta")
    withNulls.write.format("readstat").mode("overwrite")
      .option("dtaVersion", "114").save(p2)
    val b2 = spark.read.format("readstat").load(p2).orderBy("id").collect()
    assert(b2(0).isNullAt(1) && b2(1).isNullAt(2))
  }

  test("dta 114 rejects over-wide strings with a clear error") {
    import spark.implicits._
    val df = Seq((1, "z" * 300)).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      df.write.format("readstat").mode("overwrite")
        .option("dtaVersion", "114").save(tmp("v114_wide.dta"))
    }
    assert(e.getMessage.contains("117"))
  }

  test("dta 114 width cap is measured in windows-1252 bytes, not UTF-8") {
    import spark.implicits._
    // 200 'é' chars = 400 UTF-8 bytes but only 200 cp1252 bytes — must be
    // accepted at 114 (cap 244) and survive the transcoding roundtrip
    val df = Seq((1, "é" * 200), (2, "a" * 244)).toDF("id", "s")
    val path = tmp("v114_cp1252.dta")
    df.write.format("readstat").mode("overwrite")
      .option("dtaVersion", "114").save(path)
    val md = graft.core.stata.StataParser.parse(path)
    assert(md.version == 114)
    val back = spark.read.format("readstat").load(path).orderBy("id").collect()
    assert(back(0).getString(1) == "é" * 200)
    assert(back(1).getString(1) == "a" * 244)
  }

  test("wide frame (600 columns) roundtrips through dta") {
    val n = 600
    val schema = org.apache.spark.sql.types.StructType(
      (0 until n).map(i => org.apache.spark.sql.types.StructField(
        s"c$i", org.apache.spark.sql.types.DoubleType)))
    val rows = (0 until 50).map(r =>
      org.apache.spark.sql.Row.fromSeq((0 until n).map(c => (r * n + c).toDouble)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 2), schema)
    val path = tmp("wide.dta")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path)
    assert(back.columns.length == n)
    assert(back.count() == 50)
    import org.apache.spark.sql.functions._
    assert(back.agg(sum("c599")).collect()(0).getDouble(0) ==
      (0 until 50).map(r => (r * n + 599).toDouble).sum)
  }

  test("multiFile write: one self-contained dta per partition, no splice") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 5000).map(i =>
        (i.toLong, s"name$i", i * 1.25, if (i % 2 == 0) 1 else 2,
          if (i % 100 == 0) s"long$i " * 500 else s"short$i")) // strL mix
      .toDF("id", "s", "v", "sex", "blob")
      .repartition(7)
    val dir = tmp("multi.dta")
    df.write.format("readstat").mode("overwrite")
      .option("multiFile", "true")
      .option("valueLabels", "sex:1=Male,2=Female")
      .save(dir)

    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("part-\\d{5}\\.dta")).sortBy(_.getName)
    assert(parts.length == 7, s"expected 7 part files, got ${parts.length}")

    // the whole directory reads back as one frame with the same data
    val back = spark.read.format("readstat").load(dir)
    assert(back.count() == 5000L)
    assert(back.agg(sum("v").cast("double")).collect()(0).getDouble(0) ==
      (1 to 5000).map(_ * 1.25).sum)
    assert(back.select("s").as[String].collect().toSet ==
      (1 to 5000).map(i => s"name$i").toSet)
    // strL payloads (per-file GSO sections with restarted refs) round-trip
    assert(back.filter(col("id") % 100 === 0).select("blob").as[String]
      .collect().forall(s => s.startsWith("long") && s.length > 2045))

    // every part file is independently valid, carries the value labels,
    // and its header row count matches its data
    val one = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(parts(0).getAbsolutePath)
    assert(one.select("sex").as[String].collect().toSet.subsetOf(Set("Male", "Female")))
    val metaCounts = spark.read.format("readstat-file-metadata")
      .load(parts.map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("row_count").as[Long].collect()
    assert(metaCounts.sum == 5000L && metaCounts.forall(_ > 0))
  }

  test("append adds parts to a multiFile directory; single-file append errors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmp("multi_append.dta")
    def df(r: Range) = r.map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    df(1 to 100).repartition(2)
      .write.format("readstat").mode("overwrite")
      .option("multiFile", "true").save(dir)
    df(101 to 130).repartition(1)
      .write.format("readstat").mode("append")
      .option("multiFile", "true").save(dir)
    val back = spark.read.format("readstat").load(dir)
    assert(back.count() == 130L)
    assert(back.agg(sum("v").cast("double")).collect()(0).getDouble(0) ==
      (1 to 130).map(_.toDouble).sum)
    // appended parts coexist with the originals (unique run prefix)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("part-.*\\.dta"))
    assert(parts.length == 3, parts.map(_.getName).mkString(","))
    // a later overwrite clears BOTH naming schemes
    df(1 to 10).repartition(1)
      .write.format("readstat").mode("overwrite")
      .option("multiFile", "true").save(dir)
    assert(spark.read.format("readstat").load(dir).count() == 10L)

    // single-file append to an existing file is a clear error, not a
    // silent overwrite
    val single = tmp("single.dta")
    df(1 to 5).write.format("readstat").mode("overwrite").save(single)
    val e = intercept[Exception] {
      df(6 to 9).write.format("readstat").mode("append").save(single)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("requires multiFile=true")),
      msgs(e).mkString(" | "))
    // appending to a NOT-yet-existing single file is just a write
    val fresh = tmp("fresh.dta")
    df(1 to 4).write.format("readstat").mode("append").save(fresh)
    assert(spark.read.format("readstat").load(fresh).count() == 4L)
  }

  test("multiFile overwrite re-run targets the directory, no stale parts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmp("multi_rerun.dta")
    def write(n: Int, parts: Int): Unit =
      (1 to n).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
        .repartition(parts)
        .write.format("readstat").mode("overwrite")
        .option("multiFile", "true").save(dir)
    write(1000, 6)
    // second run writes into the now-EXISTING directory: the write must
    // target the directory the user named (not an expanded part file) and
    // leave no stale parts from the larger first run behind
    write(40, 2)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("part-\\d{5}\\.dta"))
    assert(files.length == 2, s"stale part files: ${files.length}")
    val back = spark.read.format("readstat").load(dir)
    assert(back.count() == 40L)
    assert(back.agg(sum("v").cast("double")).collect()(0).getDouble(0) ==
      (1 to 40).map(_ * 2.0).sum)
  }

  test("taggedMissings write .a-.z sentinels that roundtrip informative nulls") {
    import spark.implicits._
    // write-side informative nulls (inverse of the read-side capture;
    // the reference writer flattens user missings to sysmiss): a string
    // indicator column drives the sentinel tag per storage type —
    // byte/int/long step by n, float by n<<11, double by n<<40
    val df = Seq(
      (Some(1.toByte), None: Option[String], Some(10), None: Option[String],
        Some(1.5f), None: Option[String], Some(2.5), None: Option[String]),
      (None, Some(".a"), None, Some(".b"), None, Some(".c"), None, Some(".d")),
      (None, None, None, None, None, None, None, None),
      (None, Some(".z"), None, Some(".z"), None, Some(".z"), None, Some(".z")),
      (None, Some("."), None, Some("."), None, Some("."), None, Some("."))
    ).toDF("b", "b_null", "i", "i_null", "f", "f_null", "d", "d_null")
    val path = tmp("tagged.dta")
    df.write.format("readstat").mode("overwrite")
      .option("taggedMissings", "b:b_null|i:i_null|f:f_null|d:d_null")
      .save(path)
    val back = spark.read.format("readstat")
      .option("informativeNulls", "true")
      .option("informativeNullUseValueLabels", "false").load(path)
    // indicator columns were dropped from the file and re-derived on read
    assert(back.columns.toSeq ==
      Seq("b", "b_null", "i", "i_null", "f", "f_null", "d", "d_null"))
    def inds(c: String): Seq[String] =
      back.select(c).collect().map(r => Option(r.getString(0)).orNull).toSeq
    // '.' and absent indicators both mean plain sysmiss → null on read
    assert(inds("b_null") == Seq(null, ".a", null, ".z", null))
    assert(inds("i_null") == Seq(null, ".b", null, ".z", null))
    assert(inds("f_null") == Seq(null, ".c", null, ".z", null))
    assert(inds("d_null") == Seq(null, ".d", null, ".z", null))
    // values untouched; tagged float/double cells read as NaN (the
    // reader's documented behavior), sysmiss as null, int family as null
    val dVals = back.select("d").collect().map(r =>
      if (r.isNullAt(0)) "null"
      else if (r.getDouble(0).isNaN) "NaN" else r.getDouble(0).toString)
    assert(dVals.toSeq == Seq("2.5", "NaN", "null", "NaN", "null"), dVals.toSeq)
    assert(back.select(col("b").cast("double")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0)).toSeq ==
      Seq(1.0, null, null, null, null))
    // full symmetry: read1 → write(taggedMissings) → read2 is identical
    val p2 = tmp("tagged2.dta")
    back.write.format("readstat").mode("overwrite")
      .option("taggedMissings", "b:b_null|i:i_null|f:f_null|d:d_null")
      .save(p2)
    val back2 = spark.read.format("readstat")
      .option("informativeNulls", "true")
      .option("informativeNullUseValueLabels", "false").load(p2)
    assertSameData(back2, back, "tagged-roundtrip")
    // bad indicator values and mis-targeted options fail loudly
    assert(intercept[Exception] {
      Seq((None: Option[Double], Some("missing"))).toDF("v", "v_null")
        .write.format("readstat").mode("overwrite")
        .option("taggedMissings", "v:v_null").save(tmp("badtag.dta"))
    }.getMessage.contains("'.a'-'.z'"))
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("taggedMissings", "b:nosuch").save(tmp("badcol.dta"))
    }.getMessage.contains("not found"))
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("taggedMissings", "b_null:b").save(tmp("badtype.dta"))
    }.getMessage.contains("string column"))
  }

  test("fileFormat write override + magic-byte sniff read extension-less paths") {
    import spark.implicits._
    // reference write_readstat(format=...) overrides suffix detection;
    // our reader goes further and sniffs the signature when the
    // extension is unknown, so staged extension-less files roundtrip
    val df = Seq((1.0, "a"), (2.0, "b"), (3.0, "c")).toDF("v", "s")
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_override")
    for ((fmt, alias) <- Seq("dta" -> "stata", "sav" -> "spss",
        "zsav" -> "zsav", "xpt" -> "xpt", "por" -> "spss_por")) {
      val p = s"$dir/staged_$fmt"  // no extension
      df.write.format("readstat").mode("overwrite")
        .option("fileFormat", alias).save(p)
      val back = spark.read.format("readstat").load(p)
      assert(back.count() == 3L, fmt)
      assert(back.agg(sum(back.columns.head)).collect()(0).getDouble(0) == 6.0,
        s"$fmt: ${back.columns.mkString(",")}")
    }
    // unknown format name and unsniffable content both fail loudly
    assert(intercept[Exception] {
      df.write.format("readstat").mode("overwrite")
        .option("fileFormat", "parquet").save(s"$dir/bad")
    }.getMessage.contains("unknown fileFormat"))
    val junk = s"$dir/junk"
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      "not a stat file at all, just text".getBytes)
    assert(intercept[Exception] {
      spark.read.format("readstat").load(junk).schema
    }.getMessage.contains("no known stat-format signature"))
  }
}
