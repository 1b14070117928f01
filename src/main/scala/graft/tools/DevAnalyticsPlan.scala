package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape repro for the round-8 analytics queries: prints the
  * exchange/scan/window skeleton of each executed plan so the scale
  * claims in COVERAGE.md (single key shuffle, no explode for BM25 tf,
  * TakeOrdered top-k) stay checkable.
  * Usage: runMain graft.tools.DevAnalyticsPlan [sfDir]
  */
object DevAnalyticsPlan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("text_bm25_topk", "freq_heavy_hitters", "cdc_latest_state",
        "cdc_scd2_intervals", "events_gapfill")) {
      println(s"===== $q")
      val plan = graft.SparkEntry.queries(q)(spark, d)
        .queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Scan") ||
        l.contains("TakeOrdered") || l.contains("Window") ||
        l.contains("Generate") || l.contains("Aggregate") ||
        l.contains("Join")).mkString("\n"))
    }
    spark.stop()
  }
}
