package graft.tools

import org.apache.spark.sql.SparkSession

/** Timing repro for profile_lineitem's plan shape (multi-distinct
  * Expand vs per-column two-level distinct aggregates). */
object DevProfileTime {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.queries.Relational.profileLineitem(spark, sf).collect()
      println(f"[devprofile] run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
