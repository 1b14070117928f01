package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev harness: read a .dta via the connector, print schema + rows;
  * optionally roundtrip a small frame through the writer.
  * Usage: runMain graft.tools.DevSmoke <file.dta> [roundtrip]
  */
object DevSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.headOption match {
      case Some(path) if !path.startsWith("roundtrip") =>
        val df = spark.read.format("readstat").load(path)
        df.printSchema()
        df.show(10, truncate = 20)
        println(s"count=${df.count()}")
      case _ =>
        import spark.implicits._
        val df = Seq(
          (1, 1.5, "alpha", java.sql.Date.valueOf("2020-01-02"),
            java.sql.Timestamp.valueOf("2021-03-04 05:06:07.89")),
          (2, -2.25, "beta", java.sql.Date.valueOf("1959-12-31"), null),
          (3, Double.NaN, null, null,
            java.sql.Timestamp.valueOf("1960-01-01 00:00:00.0"))
        ).toDF("id", "x", "s", "d", "ts")
        val out = "/tmp/graft_dev/rt.dta"
        df.write.format("readstat").mode("overwrite").save(out)
        println(s"wrote $out")
        val back = spark.read.format("readstat").load(out)
        back.printSchema()
        back.show(truncate = false)
    }
    spark.stop()
  }
}
