package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: does the triangle query's executed plan reuse the edge-build
  * exchange across its three consumers (degree union x2 + annotate)? */
object DevTriPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val df = graft.queries.Analytics.graphTriangles(spark, d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val reused = "ReusedExchange".r.findAllIn(plan).length
    val exchanges = "Exchange".r.findAllIn(plan).length
    val smj = "SortMergeJoin".r.findAllIn(plan).length
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    println(s"[triplan] exchanges=$exchanges reused=$reused smj=$smj bhj=$bhj")
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join")).mkString("\n"))
    spark.stop()
  }
}
