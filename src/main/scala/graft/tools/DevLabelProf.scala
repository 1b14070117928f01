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
    // r12: three variants — labeled columnar (default), labeled with the
    // row path forced via a no-op schemaOverride, and raw — so the
    // columnar-label work is separable from the label work itself
    def scan(lab: Boolean, forceRows: Boolean = false) = {
      var r = spark.read.format("readstat")
        .option("partitionTargetBytes", "16777216")
      if (lab) r = r.option("valueLabelsAsStrings", "true")
      if (forceRows) r = r.option("schemaOverrides",
        if (lab) "q_code STRING" else "q_code INT")
      r.load(p)
        .select("q_code", "l_quantity")
        .agg(count(col("q_code")), count(col("l_quantity")))
        .collect()(0).getLong(0)
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    scan(true, forceRows = false); scan(false, forceRows = false)
    scan(true, forceRows = true) // warm
    def best(lab: Boolean, forceRows: Boolean): Seq[Double] =
      Seq.fill(5)(time(() => scan(lab, forceRows)))
    val on = best(lab = true, forceRows = false)
    val onRows = best(lab = true, forceRows = true)
    val off = best(lab = false, forceRows = false)
    def s(xs: Seq[Double]) = f"${xs.map(x => f"$x%.3f").mkString(",")} min=${xs.min}%.3f"
    println(f"[labelprof] columnar-labeled=${s(on)}")
    println(f"[labelprof] row-labeled     =${s(onRows)}")
    println(f"[labelprof] raw-columnar    =${s(off)}")
    println(f"[labelprof] ratio col-lab/raw=${on.min / off.min}%.2f row-lab/raw=${onRows.min / off.min}%.2f")
    spark.stop()
  }
}
