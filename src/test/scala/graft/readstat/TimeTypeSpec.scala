package graft.readstat

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimeType}

/** `timeAsTimeType` must be honored by EVERY format module (reference
  * time kinds: stata %tcHH:MM:SS → polars_output.rs:713-780, SAS
  * TIME_FORMATS → constants.rs:23-39, xpt col_kind → xpt.rs:487-504),
  * not just SPSS: a time-kind column surfaces as Spark 4.1 TIME(6)
  * with the option on, and as the documented nanos-of-day LongType
  * with it off — same physical values either way. */
class TimeTypeSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft_timetype").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name"
  }

  test("timeAsTimeType surfaces TIME(6) on dta, sas7bdat, xpt and por") {
    import spark.implicits._
    // stored value per format: stata %tc carries ms-of-day, SAS/XPT/POR
    // TIME carries seconds-of-day; both decode to the same nanos-of-day
    val cases = Seq(
      ("t.dta", "t:%tcHH:MM:SS", 36610000.0, 45296000.0),
      ("t.sas7bdat", "t:TIME8", 36610.0, 45296.0),
      ("t.xpt", "t:TIME8", 36610.0, 45296.0),
      ("t.por", "t:TIME8", 36610.0, 45296.0))
    for ((name, fmt, v1, v2) <- cases) {
      val p = tmp(name)
      Seq((1.0, Some(v1)), (2.0, Some(v2)), (3.0, None: Option[Double]))
        .toDF("id", "t")
        .write.format("readstat").mode("overwrite")
        .option("varFormats", fmt).save(p)

      val on = spark.read.format("readstat")
        .option("timeAsTimeType", "true").load(p)
      val Array(idCol, tCol) = on.columns // xpt/por uppercase names
      assert(on.schema(tCol).dataType == TimeType(6),
        s"$name: ${on.schema.treeString}")
      val strs = on.orderBy(idCol)
        .selectExpr(s"cast($tCol as string) AS s").collect()
        .map(r => Option(r.getString(0)).orNull).toSeq
      assert(strs == Seq("10:10:10", "12:34:56", null), s"$name: $strs")

      // option off: the documented nanos-of-day LongType, same values
      val off = spark.read.format("readstat").load(p)
      assert(off.schema(tCol).dataType == LongType, s"$name (off)")
      val nanos = off.orderBy(idCol).select(tCol).collect()
        .map(r => if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
        .toSeq
      assert(nanos == Seq(36610000000000L, 45296000000000L, null),
        s"$name (off): $nanos")
    }
  }

  test("por varFormats validate loudly") {
    import spark.implicits._
    val df = Seq((1.0, "x")).toDF("v", "s")
    def err(opts: (String, String)*): String = {
      intercept[Exception] {
        val w = df.write.format("readstat").mode("overwrite")
        opts.foreach { case (k, x) => w.option(k, x) }
        w.save(tmp("bad.por"))
      }.getMessage
    }
    assert(err("varFormats" -> "nope:TIME8").contains("unknown column"))
    assert(err("varFormats" -> "s:TIME8").contains("string column"))
    assert(err("varFormats" -> "v:WEIRD9").contains("not a supported"))
  }
}
