package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing harness for the value-label decode path: labels ON vs OFF on
  * the same 10M-row labeled dta (min-of-3 after one warm run). */
object DevLabelProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = args.headOption.getOrElse(
      "/tmp/graft_bench/_root_testdata_sf0_1_big_lab_v1.dta")
    def scan(lab: Boolean) = {
      val r = spark.read.format("readstat")
        .option("partitionTargetBytes", "16777216")
      (if (lab) r.option("valueLabelsAsStrings", "true") else r).load(p)
        .select("q_code", "l_quantity")
        .agg(count(col("q_code")), count(col("l_quantity")))
        .collect()(0).getLong(0)
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    scan(true); scan(false) // warm
    val on = Seq.fill(3)(time(() => scan(true)))
    val off = Seq.fill(3)(time(() => scan(false)))
    println(f"[labelprof] on=${on.map(x => f"$x%.3f").mkString(",")} min=${on.min}%.3f " +
      f"off=${off.map(x => f"$x%.3f").mkString(",")} min=${off.min}%.3f ratio=${on.min / off.min}%.2f")
    spark.stop()
  }
}
