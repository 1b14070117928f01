package graft.readstat

import java.nio.file.Files
import graft.api.Readstat
import org.apache.spark.sql.functions._

/** The one-call facade mirrors the reference's public functions
  * (scan/read/write/read_sas7bcat/metadata). */
class ApiFacadeSpec extends SparkTestBase {

  test("scan/write/metadata round-trip through the facade") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_api").toFile
    dir.deleteOnExit()
    val path = s"$dir/f.dta"
    val df = (1 to 30).map(i => (i.toLong, s"n$i", i * 0.5)).toDF("id", "s", "v")
    Readstat.write(df, path)

    val back = Readstat.scan(spark, path)
    assert(back.count() == 30L)
    assert(Readstat.read(spark, path).select(sum("v")).collect()(0)
      .getDouble(0) == (1 to 30).map(_ * 0.5).sum)

    val meta = Readstat.metadata(spark, path)
    assert(meta.select("name").collect().map(_.getString(0)).toSet ==
      Set("id", "s", "v"))
    val fm = Readstat.fileMetadata(spark, path)
    assert(fm.count() == 1L)
    assert(fm.select("row_count").collect()(0).getLong(0) == 30L)

    // mixed-format multi-path scan with mergeSchema
    val path2 = s"$dir/g.sav"
    Readstat.write(df.withColumn("extra", lit(1.0)), path2)
    val merged = Readstat.scanAll(spark, Seq(path, path2),
      Map("mergeSchema" -> "true"))
    assert(merged.count() == 60L)
    assert(merged.columns.toSet == Set("id", "s", "v", "extra"))
  }

  test("Readstat.sink streams into one .dta like the reference's sink_stata") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_apisink").toFile
    dir.deleteOnExit()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val q = Readstat.sink(input.toDF().toDF("id", "v"),
      s"$dir/s.dta", s"$dir/ckpt")
    try {
      input.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      assert(Readstat.read(spark, s"$dir/s.dta").count() == 2L)
    } finally q.stop()
    // batch frames are redirected to write()
    val e = intercept[IllegalArgumentException] {
      Readstat.sink(Seq((1L, 1.0)).toDF("id", "v"), s"$dir/x.dta", s"$dir/ck2")
    }
    assert(e.getMessage.contains("STREAMING"))
  }

  test("readSas7bcat exposes the catalog label maps") {
    val cat = Readstat.readSas7bcat(
      "/root/reference/crates/polars_readstat_rs/tests/sas/data/data_gov/formats.sas7bcat")
    assert(cat.numeric.nonEmpty || cat.string.nonEmpty)
  }
}
