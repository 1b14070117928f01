package graft.readstat

import java.nio.file.Files
import org.apache.spark.sql.functions.timestamp_seconds
import org.apache.spark.sql.types._
import graft.spark.readstat.writers.WriteCompress

/** Write-side compress (reference `with_compress` / `compress_df`,
  * writer.rs:185-230 + compress.rs:82-202): narrowing decisions, the
  * Stata missing-sentinel bounds, option toggles, and the end-to-end
  * `.option("compress", true)` write→read roundtrip. */
class WriteCompressSpec extends SparkTestBase {

  import spark.implicits._

  private def opts(kv: (String, String)*): WriteCompress.Opts =
    WriteCompress.Opts.from(kv.toMap, isDta = true)

  test("f64 integer columns narrow to the smallest int type that fits") {
    val df = Seq(
      (1.0, 200.0, 50000.0, 3.0e9, 1.5),
      (2.0, -100.0, 2.0, 5.0, 2.25)).toDF("b8", "i16", "i32", "big", "frac")
    val out = WriteCompress(df, opts())
    assert(out.schema("b8").dataType == ByteType)
    assert(out.schema("i16").dataType == ShortType)
    assert(out.schema("i32").dataType == IntegerType)
    assert(out.schema("big").dataType == DoubleType) // > int32 bounds
    assert(out.schema("frac").dataType == DoubleType) // non-integral: unchanged
    val r = out.orderBy("b8").collect()
    assert(r(0).getByte(0) == 1 && r(0).getShort(1) == 200 &&
      r(0).getInt(2) == 50000 && r(0).getDouble(3) == 3.0e9 &&
      r(0).getDouble(4) == 1.5)
  }

  test("stata bounds exclude the missing-sentinel range; standard bounds don't") {
    // 101 is a legal int8 value but a Stata byte MISSING sentinel
    val df = Seq(101.0, 5.0).toDF("v")
    assert(WriteCompress(df, opts()).schema("v").dataType == ShortType)
    assert(WriteCompress(df, opts("compressStataBounds" -> "false"))
      .schema("v").dataType == ByteType)
  }

  test("0/1 columns become boolean unless compressNoBoolean") {
    val df = Seq(0.0, 1.0, 0.0).toDF("flag")
    assert(WriteCompress(df, opts()).schema("flag").dataType == BooleanType)
    assert(WriteCompress(df, opts("compressNoBoolean" -> "true"))
      .schema("flag").dataType == ByteType)
  }

  test("all-null columns become boolean on non-empty frames only") {
    val df = Seq((1.0, None: Option[Double]), (2.0, None))
      .toDF("a", "allnull")
    assert(WriteCompress(df, opts()).schema("allnull").dataType == BooleanType)
    assert(WriteCompress(df, opts("compressAllNullToBoolean" -> "false"))
      .schema("allnull").dataType == DoubleType)
    val empty = Seq.empty[(Double, Option[Double])].toDF("a", "allnull")
    assert(WriteCompress(empty, opts()).schema("allnull").dataType == DoubleType)
  }

  test("all-midnight timestamps become dates; any intra-day value blocks it") {
    val mid = Seq("2024-01-01 00:00:00", "2024-03-05 00:00:00")
      .toDF("s").select($"s".cast("timestamp_ntz").as("t"))
    assert(WriteCompress(mid, opts()).schema("t").dataType == DateType)
    val intra = Seq("2024-01-01 00:00:00", "2024-03-05 13:30:00")
      .toDF("s").select($"s".cast("timestamp_ntz").as("t"))
    assert(WriteCompress(intra, opts()).schema("t").dataType == TimestampNTZType)
    assert(WriteCompress(mid, opts("compressCheckDateTime" -> "false"))
      .schema("t").dataType == TimestampNTZType)
  }

  test("numeric strings parse under compressCheckString; one bad value vetoes") {
    val nums = Seq("1", " 2 ", "").toDF("v")
    // "" → null, 1/2 integral → byte
    assert(WriteCompress(nums, opts("compressCheckString" -> "true"))
      .schema("v").dataType == ByteType)
    val fracs = Seq("1.5", "2.25").toDF("v")
    assert(WriteCompress(fracs, opts("compressCheckString" -> "true"))
      .schema("v").dataType == DoubleType)
    val bad = Seq("1", "x").toDF("v")
    assert(WriteCompress(bad, opts("compressCheckString" -> "true"))
      .schema("v").dataType == StringType)
    // default: strings untouched (reference check_string = false)
    assert(WriteCompress(nums, opts()).schema("v").dataType == StringType)
  }

  test("string 0/1 columns narrow to boolean through the parsed path (ANSI-safe)") {
    // raw cast('' as boolean) / cast('1.0' as boolean) throws under
    // Spark 4 ANSI; the reference parses to f64 first and succeeds
    val df = Seq("0", "1.0", " 1 ", "").toDF("v")
    val out = WriteCompress(df, opts("compressCheckString" -> "true"))
    assert(out.schema("v").dataType == BooleanType)
    assert(out.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(false), Some(true), Some(true), None))
  }

  test("all-empty-string column is all-null POST-PARSE → boolean, not numeric") {
    val df = Seq("", "  ", "").toDF("v")
    val out = WriteCompress(df, opts("compressCheckString" -> "true"))
    assert(out.schema("v").dataType == BooleanType)
    assert(out.collect().forall(_.isNullAt(0)))
    // with the all-null rule off, the column stays a string
    assert(WriteCompress(df, opts("compressCheckString" -> "true",
      "compressAllNullToBoolean" -> "false")).schema("v").dataType == StringType)
  }

  test("all-null temporal columns narrow to typed nulls without an ANSI cast crash") {
    // cast(timestamp AS boolean) is DATATYPE_MISMATCH under ANSI even
    // when every value is null — the all-null rule must emit typed nulls
    val ts = Seq((1.0, None: Option[java.sql.Timestamp]))
      .toDF("a", "t").select($"a", $"t".cast("timestamp"))
    val out = WriteCompress(ts, opts())
    assert(out.schema("t").dataType == BooleanType)
    assert(out.collect().forall(_.isNullAt(1)))
    val dt = Seq((1.0, None: Option[java.sql.Date])).toDF("a", "d")
    val out2 = WriteCompress(dt, opts())
    assert(out2.schema("d").dataType == BooleanType)
    assert(out2.collect().forall(_.isNullAt(1)))
  }

  test("zoned-timestamp midnight check is UTC epoch-based, not session-TZ") {
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // UTC midnights (epoch multiples of 86400s) — NOT local midnights
      val utcMid = Seq(19723L * 86400, 19724L * 86400).toDF("s")
        .select(timestamp_seconds($"s").as("t"))
      val out = WriteCompress(utcMid, opts())
      assert(out.schema("t").dataType == DateType)
      // and the extracted dates are the UTC days, independent of session TZ
      assert(out.orderBy("t").collect().map(_.getDate(0).toString).toSeq ==
        Seq("2024-01-01", "2024-01-02"))
      // local (EST) midnight = 05:00 UTC → must NOT compress
      val localMid = Seq(19723L * 86400 + 5 * 3600).toDF("s")
        .select(timestamp_seconds($"s").as("t"))
      assert(WriteCompress(localMid, opts()).schema("t").dataType == TimestampType)
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("int64 out of int32 bounds becomes float64, like the reference") {
    val df = Seq(3000000000L, 5L).toDF("v")
    assert(WriteCompress(df, opts()).schema("v").dataType == DoubleType)
    val small = Seq(70000L, 5L).toDF("v")
    assert(WriteCompress(small, opts()).schema("v").dataType == IntegerType)
  }

  test("compressCols restricts the pass to the named subset") {
    val df = Seq((5.0, 2.0)).toDF("a", "b")
    val out = WriteCompress(df, opts("compressCols" -> "a"))
    assert(out.schema("a").dataType == ByteType)
    assert(out.schema("b").dataType == DoubleType)
  }

  test(".option(compress, true) writes narrowed storage, values roundtrip") {
    val dir = Files.createTempDirectory("graft_wcompress").toFile
    dir.deleteOnExit()
    val p = s"$dir/c.dta"
    val df = Seq((1L, 5.0, 1.0, 2.5), (2L, 7.0, 0.0, -3.25))
      .toDF("id", "v", "flag", "x")
    df.write.format("readstat").option("compress", "true")
      .mode("overwrite").save(p)
    val back = spark.read.format("readstat").load(p)
    // id/v → stata byte storage, flag → boolean → byte storage, x stays f64
    assert(back.schema("id").dataType == ByteType)
    assert(back.schema("v").dataType == ByteType)
    assert(back.schema("flag").dataType == ByteType)
    assert(back.schema("x").dataType == DoubleType)
    val rows = back.orderBy("id").collect()
    assert(rows.map(r => (r.getByte(0).toLong, r.getByte(1).toDouble,
      r.getByte(2).toDouble, r.getDouble(3))).toSeq ==
      Seq((1L, 5.0, 1.0, 2.5), (2L, 7.0, 0.0, -3.25)))
    // without compress the same frame stores f64/f64 (id long → double)
    val p2 = s"$dir/nc.dta"
    df.write.format("readstat").mode("overwrite").save(p2)
    val back2 = spark.read.format("readstat").load(p2)
    assert(back2.schema("v").dataType == DoubleType)
    assert(new java.io.File(p).length() < new java.io.File(p2).length(),
      "compressed storage must be smaller")
  }
}
