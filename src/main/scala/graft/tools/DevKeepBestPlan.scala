package graft.tools

import org.apache.spark.sql.SparkSession

/** Repro behind dedup_keep_best's one-dataflow shape: with the output
  * expressed as a paired/singleton UNION, the left-anti singleton
  * branch is sunk below the quality repartition by
  * PushDownLeftSemiAntiJoin, the exchange subtrees stop canonicalizing
  * equal, and the executed plan pays a third full-text scan. The
  * left-outer + coalesce formulation keeps both consumers on one
  * reused exchange. Run this to see the executed-plan scan/reuse
  * counts (AQE reuses exchanges at stage creation, so only the
  * post-execution plan shows it).
  */
object DevKeepBestPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.Text.keepBest(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    val reused = "ReusedExchange".r.findAllIn(plan).size
    println(s"[devkeepbest] scans=$scans reused=$reused")
    spark.stop()
  }
}
