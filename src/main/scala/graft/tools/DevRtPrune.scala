package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev harness: run the `stata_runtime_prune_join` registry query
  * against a testdata dir and report whether the dynamic-pruning
  * subquery reached the readstat scan.
  * Usage: runMain graft.tools.DevRtPrune [sfDir]
  */
object DevRtPrune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val df = graft.SparkEntry.queries("stata_runtime_prune_join")(spark, dir)
    df.show(10, truncate = false)
    val plan = df.queryExecution.executedPlan.toString
    println("HAS_DPP=" + plan.contains("dynamicpruning"))
    println("HAS_RTF=" + plan.contains("RuntimeFilters: [dynamicpruning"))
    spark.stop()
  }
}
