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

  test("random frames roundtrip through dta and sav") {
    val genRows = Gen.listOfN(25,
      Gen.zip(genDouble, genInt, genStr).map { case (d, i, s) => Row(d, i, s) })
    (1L to 5L).foreach { seed =>
      val rows = genRows.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 2), schema)
      val dir = Files.createTempDirectory("graft_prop").toFile
      dir.deleteOnExit()
      Seq("p.dta", "p.sav").foreach { name =>
        val path = s"${dir.getAbsolutePath}/$name"
        df.write.format("readstat").mode("overwrite").save(path)
        val back = spark.read.format("readstat")
          .option("missingStringAsNull", "false").load(path)
        // normalize: dta keeps Int as int; sav stores all numerics as f64.
        // Nulls and empty strings coincide under missingStringAsNull=false
        // except that a written null string reads back as "".
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
