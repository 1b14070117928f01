package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the row-path fallback cost of option-driven reads (labels,
  * informative nulls) against the plain columnar read (dev scratch). */
object DevLabelProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val path = "/tmp/graft_bench/labeled_10m.dta"
    if (!new java.io.File(path).exists()) {
      spark.range(10000000L)
        .select(col("id"), (col("id") % 5 + 1).cast("int").as("code"),
          (col("id") % 97).cast("double").as("v"))
        .write.format("readstat").mode("overwrite")
        .option("valueLabels", "code:1=Alpha,2=Beta,3=Gamma,4=Delta,5=Epsilon")
        .save(path)
    }
    def t(name: String)(f: => Any): Unit = {
      f // warm
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-28s min=${runs.min}%6.3f  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    def rd = spark.read.format("readstat")
      .option("partitionTargetBytes", "16777216")
    t("plain fullread (columnar)") {
      rd.load(path).queryExecution.toRdd.count()
    }
    t("labels-as-strings fullread") {
      rd.option("valueLabelsAsStrings", "true")
        .load(path).queryExecution.toRdd.count()
    }
    t("informativeNulls fullread") {
      rd.option("informativeNulls", "true")
        .load(path).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
