package graft.readstat

import java.io.File

/** Golden-parity and integrity tests for the .dta reader, mirroring the
  * reference's fixture-corpus strategy (SURVEY.md §5): every fixture opens
  * and reads; parallel == serial; projection/limit pushdown; value parity
  * vs pandas-exported goldens.
  */
class StataReaderSpec extends SparkTestBase {

  private def fixtures: Seq[File] =
    new File(res("fixtures/stata")).listFiles().toSeq.sortBy(_.getName)

  test("all stata fixtures open and read fully") {
    fixtures.foreach { f =>
      val df = spark.read.format("readstat").load(f.getAbsolutePath)
      assert(df.schema.nonEmpty, f.getName)
      val n = df.count()
      val md = graft.spark.readstat.StataModule.metadata(f.getAbsolutePath)
      assert(n == md.nObs, s"${f.getName}: count $n != nObs ${md.nObs}")
    }
  }

  test("fixture values match pandas goldens") {
    val goldenDir = new File(res("golden/stata"))
    goldenDir.listFiles().toSeq.sortBy(_.getName).foreach { g =>
      val name = g.getName.stripSuffix(".parquet")
      val dta = s"${res("fixtures/stata")}/$name.dta"
      val got = spark.read.format("readstat")
        .option("missingStringAsNull", "false").load(dta)
      var want = spark.read.parquet(g.getAbsolutePath)
      // pandas goldens store datetimes as TIMESTAMP(NANOS) which the
      // nanosAsLong session conf surfaces as LongType — convert back
      got.schema.fields.foreach { f =>
        val isTemporal = f.dataType == org.apache.spark.sql.types.DateType ||
          f.dataType == org.apache.spark.sql.types.TimestampNTZType ||
          f.dataType == org.apache.spark.sql.types.TimestampType
        if (isTemporal &&
            want.schema(f.name).dataType == org.apache.spark.sql.types.LongType)
          want = want.withColumn(f.name,
            org.apache.spark.sql.functions.timestamp_micros(
              (org.apache.spark.sql.functions.col(f.name) / 1000L).cast("long")))
      }
      assertSameData(got, want, name)
    }
  }

  test("parallel read == serial read") {
    val dta = res("fixtures/stata/sample.dta")
    val serial = spark.read.format("readstat").load(dta)
    val parallel = spark.read.format("readstat")
      .option("partitionTargetBytes", "4096").load(dta)
    assert(parallel.rdd.getNumPartitions > 1, "expected multiple partitions")
    // order by row index to compare deterministically across partitionings
    val si = spark.read.format("readstat").option("rowIndexName", "_i").load(dta)
    val pi = spark.read.format("readstat")
      .option("partitionTargetBytes", "4096").option("rowIndexName", "_i").load(dta)
    assertSameData(pi.orderBy("_i"), si.orderBy("_i"), "parallel-vs-serial")
  }

  test("projection pushdown decodes only requested columns") {
    val dta = res("fixtures/stata/stata14_118.dta")
    val df = spark.read.format("readstat").load(dta).select("Cities", "Ints")
    assert(df.columns.toSeq == Seq("Cities", "Ints"))
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows(0).getString(0) == "Bogota")
    // physical scan description must show only the pruned columns
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("cols=Cities,Ints"), scanDesc)
  }

  test("limit pushdown caps partition planning") {
    val dta = res("fixtures/stata/sample.dta")
    val df = spark.read.format("readstat").load(dta).limit(3)
    assert(df.count() == 3)
  }

  test("value labels as strings") {
    val dta = res("fixtures/stata/stata14_118.dta")
    val df = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(dta)
    val bytes = df.select("Bytes").collect().map(r => Option(r.getString(0)).orNull)
    assert(bytes.toSeq == Seq("option b Ünicode", null, "option a", "4", "option a"))
  }

  test("partially labeled column falls back to numeric-as-string") {
    val dta = res("fixtures/stata/stata-dta-partially-labeled.dta")
    val df = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(dta)
    val vals = df.collect().map(r => Option(r.getString(0)).orNull).toSeq
    assert(vals.exists(v => v != null && !v.forall(_.isDigit)), s"expected labels in $vals")
  }

  test("informative nulls expose .a-.z as indicator columns") {
    val dta = res("fixtures/stata/missing_test.dta")
    val df = spark.read.format("readstat")
      .option("informativeNulls", "true").load(dta)
    val indCols = df.columns.filter(_.endsWith("_null"))
    assert(indCols.nonEmpty)
    val row = df.collect()(0)
    val inds = indCols.map(c => Option(row.getAs[String](c)).orNull)
    assert(inds.exists(v => v != null && v.startsWith(".")),
      s"expected at least one .a-.z indicator, got ${inds.mkString(",")}")
  }

  test("informativeNullCols restricts indicators to the named columns") {
    val dta = res("fixtures/stata/missing_test.dta")
    val all = spark.read.format("readstat")
      .option("informativeNulls", "true").load(dta)
    val tracked = all.columns.filter(_.endsWith("_null")).map(_.stripSuffix("_null"))
    assert(tracked.length >= 2, tracked.mkString(","))
    val one = tracked.head
    val restricted = spark.read.format("readstat")
      .option("informativeNulls", "true")
      .option("informativeNullCols", one).load(dta)
    val got = restricted.columns.filter(_.endsWith("_null")).map(_.stripSuffix("_null"))
    assert(got.toSeq == Seq(one), got.mkString(","))
    // restricted indicator values match the unrestricted read
    val a = all.select(one + "_null").collect().map(r => String.valueOf(r.get(0)))
    val b = restricted.select(one + "_null").collect().map(r => String.valueOf(r.get(0)))
    assert(a.toSeq == b.toSeq)
    // a typo'd column fails loudly instead of silently not tracking
    val e = intercept[Exception] {
      spark.read.format("readstat")
        .option("informativeNulls", "true")
        .option("informativeNullCols", one + "_typo").load(dta).schema
    }
    assert(e.getMessage.contains("unknown variable"), e.getMessage)
  }

  test("informativeNullUseValueLabels prefers a label for the missing code") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_inl").toFile
    d.deleteOnExit()
    val path = s"${d.getAbsolutePath}/lbl.dta"
    // byte column; a value label is declared for raw code 102 (= .a).
    // The writer can't emit 102 as data (it's a missing sentinel), so
    // write sentinel-free data and patch one cell to 102 on disk.
    Seq((1, 2.toByte), (2, 5.toByte)).toDF("id", "v")
      .write.format("readstat").mode("overwrite")
      .option("valueLabels", "v:2=Fine,102=Refused").save(path)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // row = id:int32 LE + v:int8 → the cell '5' follows 02 00 00 00
    val pat = Array[Byte](2, 0, 0, 0, 5)
    val at = bytes.indices.indexWhere(i => i + 5 <= bytes.length &&
      (0 until 5).forall(j => bytes(i + j) == pat(j)))
    assert(at >= 0, "data pattern not found")
    bytes(at + 4) = 102.toByte // .a
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    val withL = spark.read.format("readstat")
      .option("informativeNulls", "true").load(path)
      .orderBy("id").select("v", "v_null").collect()
    assert(withL(1).isNullAt(0) && withL(1).getString(1) == "Refused", withL.mkString)
    val noL = spark.read.format("readstat")
      .option("informativeNulls", "true")
      .option("informativeNullUseValueLabels", "false").load(path)
      .orderBy("id").select("v", "v_null").collect()
    assert(noL(1).isNullAt(0) && noL(1).getString(1) == ".a", noL.mkString)
    // the labeled valid value is untouched in both reads
    assert(withL(0).getByte(0) == 2 && withL(0).isNullAt(1))
  }

  test("informative nulls struct mode: value + indicator in one struct") {
    val dta = res("fixtures/stata/missing_test.dta")
    val sep = spark.read.format("readstat")
      .option("informativeNulls", "true").load(dta)
    val st = spark.read.format("readstat")
      .option("informativeNulls", "true")
      .option("informativeNullMode", "struct").load(dta)
    // no extra columns: struct mode replaces mains in place
    assert(!st.columns.exists(_.endsWith("_null")))
    val mains = sep.columns.filter(c => sep.columns.contains(c + "_null"))
    assert(mains.nonEmpty)
    mains.foreach { m =>
      st.schema(m).dataType match {
        case s: org.apache.spark.sql.types.StructType =>
          assert(s.fieldNames.toSeq == Seq(m, "null_indicator"))
          assert(s(m).dataType == sep.schema(m).dataType)
        case other => fail(s"$m: expected struct, got $other")
      }
      // struct fields carry the same values as the separate columns
      // (string-normalized: NaN != NaN under tuple equality)
      val a = sep.select(m, m + "_null").collect()
        .map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1))))
      val b = st.select(s"$m.$m", s"$m.null_indicator").collect()
        .map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1))))
      assert(a.toSeq == b.toSeq, m)
    }
  }

  test("informative nulls merged mode: one string column per main") {
    val dta = res("fixtures/stata/missing_test.dta")
    val sep = spark.read.format("readstat")
      .option("informativeNulls", "true").load(dta)
    val mg = spark.read.format("readstat")
      .option("informativeNulls", "true")
      .option("informativeNullMode", "merged").load(dta)
    assert(!mg.columns.exists(_.endsWith("_null")))
    val mains = sep.columns.filter(c => sep.columns.contains(c + "_null"))
    mains.foreach { m =>
      assert(mg.schema(m).dataType == org.apache.spark.sql.types.StringType, m)
      val a = sep.select(m, m + "_null").collect()
      val b = mg.select(m).collect().map(r => Option(r.getString(0)).orNull)
      a.zip(b).foreach { case (r, merged) =>
        if (!r.isNullAt(0)) assert(merged == String.valueOf(r.get(0)), m)
        else if (!r.isNullAt(1)) assert(merged == r.getString(1), m) // ".a".."..z"
        else assert(merged == null, m) // system missing
      }
    }
  }

  test("informative null indicator collision with a real column errors") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_col").toFile
    d.deleteOnExit()
    val path = s"${d.getAbsolutePath}/collide.dta"
    Seq((1.0, "x")).toDF("a", "a_null").write
      .format("readstat").mode("overwrite").save(path)
    val ex = intercept[Exception] {
      spark.read.format("readstat")
        .option("informativeNulls", "true").load(path).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("conflicts"),
      s"expected collision error, got: $ex")
  }

  test("row index column is exact across partitions") {
    val dta = res("fixtures/stata/sample.dta")
    val df = spark.read.format("readstat")
      .option("partitionTargetBytes", "4096")
      .option("rowIndexName", "_idx").load(dta)
    val idx = df.select("_idx").collect().map(_.getLong(0)).sorted
    assert(idx.toSeq == (0L until idx.length).toSeq)
  }

  test("compress narrows probe-inferred types") {
    import org.apache.spark.sql.types._
    // sample_large.sav: SPSS numerics are all f64; compress narrows small ints
    val sav = res("fixtures/spss/sample.sav")
    val df = spark.read.format("readstat").option("compress", "true").load(sav)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("mylabl") == ByteType, types.toString)  // values 1.0/2.0
    assert(types("myord") == ByteType)
    // values decode in the narrowed type
    val v = df.select("mylabl").collect().map(_.getByte(0)).toSeq
    assert(v == Seq(1, 2, 1, 2, 1))
  }

  test("compress sub-flags restrict the narrowed families and columns") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_cf").toFile
    d.deleteOnExit()
    val path = s"${d.getAbsolutePath}/flags.dta"
    Seq((1.0, 2.0, "3.5"), (0.0, 5.0, "4.5"))
      .toDF("a", "b", "s").write.format("readstat").mode("overwrite").save(path)
    // compressNumeric=false: doubles stay doubles, strings still parse
    val noNum = spark.read.format("readstat")
      .option("compress", "true").option("compressNumeric", "false").load(path)
    assert(noNum.schema("a").dataType == DoubleType)
    assert(noNum.schema("s").dataType == DoubleType)
    // compressStringToNumeric=false: numeric strings stay strings
    val noStr = spark.read.format("readstat")
      .option("compress", "true").option("compressStringToNumeric", "false").load(path)
    assert(noStr.schema("s").dataType == StringType)
    assert(noStr.schema("a").dataType == BooleanType) // 0/1 values
    // compressCols: only the named column narrows
    val only = spark.read.format("readstat")
      .option("compress", "true").option("compressCols", "b").load(path)
    assert(only.schema("a").dataType == DoubleType)
    assert(only.schema("b").dataType == ByteType)
    assert(only.schema("s").dataType == StringType)
    val row = only.orderBy("b").collect()(0)
    assert(row.getDouble(0) == 1.0 && row.getByte(1) == 2 && row.getString(2) == "3.5")
  }

  test("compress strict-cast throws on probe-evading out-of-range value") {
    import spark.implicits._
    // First 100 probed rows fit a byte; row 150 (value 1000.0) does not.
    // The old wrapping cast silently decoded it as 1000.toByte == -24.
    val d = java.nio.file.Files.createTempDirectory("graft_nw").toFile
    d.deleteOnExit()
    val path = s"${d.getAbsolutePath}/evade.dta"
    val df = (1 to 200).map(i => (i, if (i == 150) 1000.0 else 2.0))
      .toDF("id", "v")
    df.write.format("readstat").mode("overwrite").save(path)
    val narrowed = spark.read.format("readstat")
      .option("compress", "true").option("compressProbeRows", "100").load(path)
    assert(narrowed.schema("v").dataType == org.apache.spark.sql.types.ByteType)
    val ex = intercept[Exception] { narrowed.select("v").collect() }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => t.getMessage != null && t.getMessage.contains("does not fit")),
      s"expected strict-cast failure, got: $ex")
  }

  test("schemaOverrides casts declared columns") {
    val dta = res("fixtures/stata/stata14_118.dta")
    val df = spark.read.format("readstat")
      .option("schemaOverrides", "Ints DOUBLE, Longs STRING").load(dta)
    assert(df.schema("Ints").dataType == org.apache.spark.sql.types.DoubleType)
    assert(df.schema("Longs").dataType == org.apache.spark.sql.types.StringType)
    val r = df.select("Ints", "Longs").collect()
    assert(r(0).getDouble(0) == 1.0)
    assert(r(0).getString(1) == "1.0")
  }
}
