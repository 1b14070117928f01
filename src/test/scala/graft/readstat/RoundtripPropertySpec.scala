package graft.readstat

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based write→read roundtrips (SURVEY.md §5: random frames →
  * dta/sav → read → normalized equality). Generators cover the missing-
  * sentinel boundaries, empty/unicode strings and extreme-but-exact
  * doubles.
  */
class RoundtripPropertySpec extends SparkTestBase {

  private val genDouble: Gen[java.lang.Double] = Gen.frequency(
    5 -> Gen.choose(-1e6, 1e6).map(d => java.lang.Double.valueOf(d)),
    2 -> Gen.oneOf(0.0, -0.0, 1.5, -2.25, 1e15, -1e15).map(java.lang.Double.valueOf(_)),
    1 -> Gen.const(null.asInstanceOf[java.lang.Double]))

  private val genInt: Gen[java.lang.Integer] = Gen.frequency(
    5 -> Gen.choose(Int.MinValue + 30, Int.MaxValue - 30).map(java.lang.Integer.valueOf(_)),
    2 -> Gen.oneOf(0, -1, 1, 32740, -32768).map(java.lang.Integer.valueOf(_)),
    1 -> Gen.const(null.asInstanceOf[java.lang.Integer]))

  private val genStr: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(40)),
    2 -> Gen.oneOf("", "héllo wörld", "日本語テキスト", "x" * 300),
    1 -> Gen.const(null))

  private val schema = StructType(Seq(
    StructField("d", DoubleType), StructField("i", IntegerType),
    StructField("s", StringType)))

  test("full-domain integer frames roundtrip through dta (promotion paths)") {
    // full Byte/Short/Int domains, including the Stata missing-sentinel
    // ranges (byte 101..127, short >= 32741, int >= 2147483621) that
    // force storage-type promotion, plus dates far from the epoch
    val genB = Gen.frequency(
      5 -> Gen.choose(-128, 127).map(v => java.lang.Byte.valueOf(v.toByte)),
      2 -> Gen.oneOf(100, 101, 127, -127, -128).map(v => java.lang.Byte.valueOf(v.toByte)),
      1 -> Gen.const(null.asInstanceOf[java.lang.Byte]))
    val genS = Gen.frequency(
      5 -> Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt)
        .map(v => java.lang.Short.valueOf(v.toShort)),
      2 -> Gen.oneOf(32740, 32741, 32767, -32767, -32768)
        .map(v => java.lang.Short.valueOf(v.toShort)),
      1 -> Gen.const(null.asInstanceOf[java.lang.Short]))
    val genI = Gen.frequency(
      5 -> Gen.choose(Int.MinValue, Int.MaxValue).map(java.lang.Integer.valueOf(_)),
      2 -> Gen.oneOf(2147483620, 2147483621, Int.MaxValue, -2147483647, Int.MinValue)
        .map(java.lang.Integer.valueOf(_)),
      1 -> Gen.const(null.asInstanceOf[java.lang.Integer]))
    val genD = Gen.frequency(
      5 -> Gen.choose(-20000L, 40000L).map(d => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(d).toString)),
      1 -> Gen.const(null.asInstanceOf[java.sql.Date]))
    val intSchema = StructType(Seq(
      StructField("b", ByteType), StructField("s", ShortType),
      StructField("i", IntegerType), StructField("dt", DateType)))
    val genRows = Gen.listOfN(30,
      Gen.zip(genB, genS, genI, genD).map { case (b, s, i, d) => Row(b, s, i, d) })
    (1L to 5L).foreach { seed =>
      val rows = genRows.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 2), intSchema)
      val dir = Files.createTempDirectory("graft_propi").toFile
      dir.deleteOnExit()
      val path = s"${dir.getAbsolutePath}/pi.dta"
      df.write.format("readstat").mode("overwrite").save(path)
      val back = spark.read.format("readstat").load(path)
      import org.apache.spark.sql.functions._
      val key = Seq(col("b").asc_nulls_last, col("s").asc_nulls_last,
        col("i").asc_nulls_last, col("dt").asc_nulls_last)
      // assertSameData normalizes all numerics to double, so promoted
      // storage types still compare by value
      assertSameData(back.orderBy(key: _*), df.orderBy(key: _*), s"promote-$seed")
    }
  }

  test("random frames roundtrip through legacy dta versions 114 and 117") {
    // legacy dta is windows-1252: generate only 1252-representable
    // strings (é/ö survive; CJK would transcode to '?' by design) and
    // cap widths under 114's 244-byte limit
    val genStr1252: Gen[String] = Gen.frequency(
      5 -> Gen.alphaNumStr.map(_.take(40)),
      2 -> Gen.oneOf("", "héllo wörld", "café", "x" * 200),
      1 -> Gen.const(null))
    val genRows = Gen.listOfN(25,
      Gen.zip(genDouble, genInt, genStr1252).map { case (d, i, s) => Row(d, i, s) })
    (1L to 3L).foreach { seed =>
      val rows = genRows.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 2), schema)
      val dir = Files.createTempDirectory("graft_propv").toFile
      dir.deleteOnExit()
      Seq("114", "117").foreach { v =>
        val path = s"${dir.getAbsolutePath}/p$v.dta"
        df.write.format("readstat").mode("overwrite")
          .option("dtaVersion", v).save(path)
        assert(graft.core.stata.StataParser.parse(path).version == v.toInt)
        val back = spark.read.format("readstat")
          .option("missingStringAsNull", "false").load(path)
        import org.apache.spark.sql.functions._
        val wantDf = df.withColumn("s", coalesce(col("s"), lit("")))
        val gotDf = back.withColumn("s", coalesce(col("s"), lit("")))
        val key = Seq(col("d").asc_nulls_last, col("i").asc_nulls_last, col("s"))
        assertSameData(gotDf.orderBy(key: _*), wantDf.orderBy(key: _*), s"v$v-$seed")
      }
    }
  }

  test("random frames roundtrip through xpt v5 and v8 (IBM float exactness)") {
    // IEEE→IBM is exact (52-bit mantissa shifts into IBM's 56); the
    // reverse direction can round, so generate doubles with headroom:
    // int/1024 fractions and sentinel-adjacent integers. Strings are
    // ISO-8859-1 (xpt's charset), space-padded on disk — trailing
    // whitespace is not representable, so the generator avoids it.
    val genD: Gen[java.lang.Double] = Gen.frequency(
      5 -> Gen.choose(-(1L << 40), 1L << 40).map(v =>
        java.lang.Double.valueOf(v / 1024.0)),
      2 -> Gen.oneOf(0.0, -0.0, 1.5, -2.25, 16777216.0, -16777216.0)
        .map(java.lang.Double.valueOf(_)),
      1 -> Gen.const(null.asInstanceOf[java.lang.Double]))
    val genS1: Gen[String] = Gen.frequency(
      5 -> Gen.alphaNumStr.map(_.take(40)),
      2 -> Gen.oneOf("", "héllo wörld", "café", "x" * 120),
      1 -> Gen.const(null))
    val genDt = Gen.frequency(
      5 -> Gen.choose(-20000L, 40000L).map(d => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(d).toString)),
      1 -> Gen.const(null.asInstanceOf[java.sql.Date]))
    val xptSchema = StructType(Seq(
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("dt", DateType)))
    val genRows = Gen.listOfN(25,
      Gen.zip(genD, genS1, genDt).map { case (d, s, dt) => Row(d, s, dt) })
    (1L to 3L).foreach { seed =>
      val rows = genRows.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 2), xptSchema)
      val dir = Files.createTempDirectory("graft_propx").toFile
      dir.deleteOnExit()
      Seq("5", "8").foreach { v =>
        val path = s"${dir.getAbsolutePath}/p$v.xpt"
        df.write.format("readstat").mode("overwrite")
          .option("xptVersion", v).save(path)
        // xpt variable names are 8-char UPPERCASE shorts; compare by
        // position with the original names restored
        val back = spark.read.format("readstat")
          .option("missingStringAsNull", "false").load(path)
          .toDF("d", "s", "dt")
        import org.apache.spark.sql.functions._
        val wantDf = df.withColumn("s", coalesce(col("s"), lit("")))
        val gotDf = back.withColumn("s", coalesce(col("s"), lit("")))
        val key = Seq(col("d").asc_nulls_last, col("s"), col("dt").asc_nulls_last)
        assertSameData(gotDf.orderBy(key: _*), wantDf.orderBy(key: _*), s"xpt$v-$seed")
      }
    }
  }

  test("random frames roundtrip through por (base-30 within read tolerance)") {
    // POR strings live in the portable charset (the 256-entry table maps
    // only ASCII alphanumerics + a punctuation set — accented chars have
    // no position, so they degrade through the lookup on BOTH engines;
    // the writer's label checks reject them loudly, data cells follow the
    // reference's raw passthrough). Doubles are base-30 whose fraction
    // digits re-accumulate as d/30^k on read — exact for integers,
    // ≤ ulp-level otherwise, inside assertSameData's 1e-12 tolerance
    val genS: Gen[String] = Gen.frequency(
      5 -> Gen.alphaNumStr.map(_.take(40)),
      2 -> Gen.oneOf("", "a b.c<(+|&", "[]!$*);^-/", "x" * 200),
      1 -> Gen.const(null))
    val genDt = Gen.frequency(
      5 -> Gen.choose(-20000L, 40000L).map(d => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(d).toString)),
      1 -> Gen.const(null.asInstanceOf[java.sql.Date]))
    val porSchema = StructType(Seq(
      StructField("d", DoubleType), StructField("i", IntegerType),
      StructField("s", StringType), StructField("dt", DateType)))
    val genRows = Gen.listOfN(25,
      Gen.zip(genDouble, genInt, genS, genDt).map {
        case (d, i, s, dt) => Row(d, i, s, dt) })
    (1L to 3L).foreach { seed =>
      val rows = genRows.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 2), porSchema)
      val dir = Files.createTempDirectory("graft_propp").toFile
      dir.deleteOnExit()
      val path = s"${dir.getAbsolutePath}/p.por"
      df.write.format("readstat").mode("overwrite").save(path)
      // por names are 8-char uppercase shorts; restore by position
      val back = spark.read.format("readstat")
        .option("missingStringAsNull", "false").load(path)
        .toDF("d", "i", "s", "dt")
      import org.apache.spark.sql.functions._
      val wantDf = df
        .withColumn("i", col("i").cast(DoubleType))
        .withColumn("s", coalesce(col("s"), lit("")))
      val gotDf = back
        .withColumn("i", col("i").cast(DoubleType))
        .withColumn("s", coalesce(col("s"), lit("")))
      val key = Seq(col("d").asc_nulls_last, col("i").asc_nulls_last,
        col("s"), col("dt").asc_nulls_last)
      assertSameData(gotDf.orderBy(key: _*), wantDf.orderBy(key: _*), s"por-$seed")
    }
  }

  test("random por value-label and missing declarations roundtrip (beyond reference)") {
    // property: for ANY label map + missing declaration the writer's spec
    // grammar accepts, the labeled/informative read matches a simple
    // reference model computed directly from the spec — pins the writer
    // tag emission and the reader decode against each other through an
    // independent oracle, not through shared code
    import org.apache.spark.sql.functions._
    val labelChars = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') :+ ' ' :+ '.'
    val genLabel: Gen[String] = Gen.choose(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(labelChars)).map(_.mkString.trim)
        .map(s => if (s.isEmpty) "L" else s))
    (1L to 4L).foreach { seed =>
      val p = Gen.Parameters.default
      def run[T](g: Gen[T], salt: Long): T =
        g.apply(p, Seed(seed * 1000 + salt)).get
      val codes = run(Gen.pick(run(Gen.choose(1, 5), 1),
        0 to 20), 2).toVector
      val labels = codes.map(c => c -> run(genLabel, 100 + c)).toMap
      val missRange: Option[(Int, Int)] =
        if (run(Gen.choose(0, 1), 5) == 1) {
          val lo = run(Gen.choose(22, 26), 6); Some((lo, lo + 2))
        } else None
      // the shared sav/por spec grammar allows ≤3 discretes, or a range
      // plus at most one discrete
      val maxDiscrete = if (missRange.isDefined) 1 else 3
      val missDiscrete = run(Gen.pick(
        run(Gen.choose(0, maxDiscrete), 3), 0 to 20), 4).toVector
      if (missDiscrete.nonEmpty || missRange.isDefined) {
        val vlSpec = "v:" + labels.toSeq.sortBy(_._1)
          .map { case (c, l) => s"$c=$l" }.mkString(",")
        val mvSpec = "v:" + (missRange.map { case (lo, hi) => s"$lo..$hi" }.toSeq ++
          missDiscrete.map(_.toString)).mkString(",")
        val data = (0 to 28).map(_.toDouble)
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(data.map(d => Row(d)), 2),
          StructType(Seq(StructField("v", DoubleType))))
        val dir = Files.createTempDirectory("graft_porvl").toFile
        dir.deleteOnExit()
        val path = s"${dir.getAbsolutePath}/pl.por"
        df.write.format("readstat").mode("overwrite")
          .option("valueLabels", vlSpec).option("missingValues", mvSpec)
          .save(path)
        // independent model of what each value must decode to
        def isMiss(d: Double): Boolean =
          missDiscrete.contains(d.toInt) && missDiscrete.map(_.toDouble).contains(d) ||
            missRange.exists { case (lo, hi) => d >= lo && d <= hi }
        val wantLabeled = data.map(d =>
          if (isMiss(d)) null
          else labels.get(d.toInt).filter(_ => codes.contains(d.toInt))
            .getOrElse(d.toLong.toString))
        val wantInd = data.map(d =>
          if (!isMiss(d)) null
          else if (missDiscrete.contains(d.toInt))
            labels.getOrElse(d.toInt, d.toLong.toString)
          else labels.getOrElse(d.toInt, "MISSING"))
        val backL = spark.read.format("readstat")
          .option("valueLabelsAsStrings", "true").load(path)
          .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
        assert(backL.toSeq == wantLabeled.toSeq,
          s"seed $seed labeled: vl=$vlSpec mv=$mvSpec\n got ${backL.toSeq}\nwant $wantLabeled")
        val backI = spark.read.format("readstat")
          .option("informativeNulls", "true").load(path)
          .select("V_null").collect()
          .map(r => if (r.isNullAt(0)) null else r.getString(0))
        assert(backI.toSeq == wantInd.toSeq,
          s"seed $seed indicator: vl=$vlSpec mv=$mvSpec\n got ${backI.toSeq}\nwant $wantInd")
      }
    }
  }

  test("random frames roundtrip through dta and sav") {
    val genRows = Gen.listOfN(25,
      Gen.zip(genDouble, genInt, genStr).map { case (d, i, s) => Row(d, i, s) })
    (1L to 5L).foreach { seed =>
      val rows = genRows.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 2), schema)
      val dir = Files.createTempDirectory("graft_prop").toFile
      dir.deleteOnExit()
      Seq("p.dta" -> Map.empty[String, String],
          "p.sav" -> Map.empty[String, String],
          "p.zsav" -> Map.empty[String, String],
          "p.sas7bdat" -> Map.empty[String, String],
          "p_rle.sas7bdat" -> Map("compression" -> "rle")).foreach {
        case (name, opts) =>
        val path = s"${dir.getAbsolutePath}/$name"
        val w = df.write.format("readstat").mode("overwrite")
        opts.foreach { case (k, v) => w.option(k, v) }
        w.save(path)
        val back = spark.read.format("readstat")
          .option("missingStringAsNull", "false").load(path)
        // normalize: dta keeps Int as int; sav/sas store all numerics as
        // f64. Nulls and empty strings coincide under
        // missingStringAsNull=false except that a written null string
        // reads back as "".
        import org.apache.spark.sql.functions._
        val wantDf = df
          .withColumn("i", col("i").cast(DoubleType))
          .withColumn("s", coalesce(col("s"), lit("")))
        val gotDf = back
          .withColumn("i", col("i").cast(DoubleType))
          .withColumn("s", coalesce(col("s"), lit("")))
        val key = Seq(col("d").asc_nulls_last, col("i").asc_nulls_last, col("s"))
        assertSameData(gotDf.orderBy(key: _*), wantDf.orderBy(key: _*), name)
      }
    }
  }
}
