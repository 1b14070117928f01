package graft.tools

import org.apache.spark.sql.SparkSession

/** Repro harness: writes a small .sas7bdat with the binary writer so an
  * INDEPENDENT implementation (pandas.read_sas, available driver-side)
  * can be pointed at it:
  *
  *   sbt "runMain graft.tools.DevSasPandas /tmp/pandas_check.sas7bdat"
  *   python3 - <<'PY'
  *   import pandas as pd
  *   df = pd.read_sas("/tmp/pandas_check.sas7bdat")
  *   print(df.dtypes); print(df)
  *   PY
  *
  * Last verified: pandas 2.x reads names, doubles, UTF-8 strings, the
  * DATE column as datetime64, and the NaN missing (see COVERAGE.md §2.4
  * sas7bdat writer row).
  */
object DevSasPandas {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/pandas_check.sas7bdat")
    val compression = if (args.length > 1) args(1) else "none"
    val spark = SparkSession.builder.master("local[2]").appName("devsas")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    Seq(
      (1, 1.5, "alpha" + " " * 60 + "padded", java.sql.Date.valueOf("2020-03-01")),
      (2, -2.25, "bee", java.sql.Date.valueOf("1959-12-31")),
      (3, 0.125, "sea", null.asInstanceOf[java.sql.Date])
    ).toDF("id", "v", "s", "d")
      .write.format("readstat").mode("overwrite")
      .option("varLabels", "v:A value")
      // arg 3 "widths" additionally exercises the r14 storageWidths
      // layout (id at LENGTH 4, d at LENGTH 4) so pandas certifies the
      // truncated-numeric encoding too (verified: pandas 2.2 reads the
      // w4 ints and the w4 DATE exactly)
      .option("storageWidths",
        if (args.length > 2 && args(2) == "widths") "id:4|d:4" else "")
      .option("compression", compression).save(out)
    println(s"wrote $out ($compression)")
    spark.stop()
  }
}
