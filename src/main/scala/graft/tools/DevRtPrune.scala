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
    df.collect() // full execution so the scan metrics below are real
    val plan = df.queryExecution.executedPlan.toString
    println("HAS_DPP=" + plan.contains("dynamicpruning"))
    println("HAS_RTF=" + plan.contains("RuntimeFilters: [dynamicpruning"))
    // plan text alone can lie: a double-keyed join still PRINTS the
    // runtime filter but translation drops it at execution. The scan's
    // numOutputRows is the ground truth for engagement.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec => q +: allNodes(q.plan)
        case n => Seq(n)
      }
    allNodes(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec if b.scan.isInstanceOf[
          graft.spark.readstat.ReadstatScan] =>
        println(s"scan numOutputRows=${b.metrics.get("numOutputRows").map(_.value)}")
    }
    spark.stop()
  }
}
