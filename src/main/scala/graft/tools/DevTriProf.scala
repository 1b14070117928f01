package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing harness for the triangle query at a scale factor: min-of-3
  * after one warm run, so ambient-load bursts are visible. */
object DevTriProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.queries.Analytics.graphTriangles(spark, d).collect()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    val runs = Seq.fill(3)(once())
    println(f"[triprof] runs=${runs.map(r => f"$r%.2f").mkString(",")} min=${runs.min}%.2f s")
    spark.stop()
  }
}
