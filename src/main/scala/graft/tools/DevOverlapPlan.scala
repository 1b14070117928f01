package graft.tools

import org.apache.spark.sql.SparkSession

/** Checks whether AQE reuses the distinct-fingerprint shuffle across
  * corpus_overlap's four consumers (scratch, not driver contract). */
object DevOverlapPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.Text.sourceOverlap(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val tree = plan.substring(0, plan.indexOf("\n\n(")) // header tree only
    println(tree)
    val reused = tree.split("\n").count(_.contains("ReusedExchange"))
    val scans = tree.split("\n").count(_.contains("Scan parquet"))
    println(s"[overlap] scans=$scans reusedExchange=$reused")
    spark.stop()
  }
}
