package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc dev harness: time the stata_runtime_prune_50m join shape
  * (int-keyed — Spark refuses to translate runtime filters on
  * float/double join keys, they normalize-wrap) with dynamic pruning
  * ON vs OFF, against the static isin equivalent, and report whether
  * the runtime In actually reduced the scan's numOutputRows.
  * Usage: runMain graft.tools.DevDppProf [sfDir]
  */
object DevDppProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bigFiles = graft.Bench.ensureBigFiles(spark, sfDir)
    def scan(p: String) = spark.read.format("readstat")
      .option("partitionTargetBytes", "16777216").load(p)
    bigFiles.foreach { case (_, _, dta50, _, _, _, _, _) =>
      val key50 = s"${dta50.stripSuffix(".dta")}_key.dta"
      if (!new java.io.File(key50).exists())
        scan(dta50)
          .withColumn("q_code", col("l_quantity").cast("int"))
          .write.format("readstat").mode("overwrite").save(key50)
      val dimPath = s"${dta50.stripSuffix(".dta")}_qdim.parquet"
      // q_code is l_quantity cast int (1..50 by construction): derive
      // the dim from a range instead of rescanning the 50M fact
      spark.range(1, 51)
        .select(col("id").cast("int").as("q_code"))
        .withColumn("hot",
          (col("q_code") === 3 || col("q_code") === 41).cast("int"))
        .coalesce(1).write.mode("overwrite").parquet(dimPath)
      def joined() = {
        val dim = spark.read.parquet(dimPath)
          .filter(col("hot") === 1).select(col("q_code").as("qk"))
        scan(key50)
          .select("q_code", "l_orderkey", "l_partkey", "l_extendedprice",
            "l_discount", "l_returnflag")
          .join(dim, col("q_code") === col("qk"))
          .agg(sum(col("l_extendedprice")), sum(col("l_discount")),
            count(col("l_orderkey")), count(col("l_partkey")),
            count(col("l_returnflag")), count(lit(1)))
      }
      def static() =
        scan(key50)
          .select("q_code", "l_orderkey", "l_partkey", "l_extendedprice",
            "l_discount", "l_returnflag")
          .filter(col("q_code").isin(3, 41))
          .agg(sum(col("l_extendedprice")), sum(col("l_discount")),
            count(col("l_orderkey")), count(col("l_partkey")),
            count(col("l_returnflag")), count(lit(1)))
      def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
        f().collect() // warm
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          f().collect()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$tag%-28s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      }
      time("join_dpp_on", joined)
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      time("join_dpp_off", joined)
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      time("static_filter", static)
      val df = joined()
      df.collect()
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
          println(s"scan runtimeFilters=${b.runtimeFilters}")
          println(s"scan numOutputRows=${b.metrics.get("numOutputRows").map(_.value)}")
      }
    }
    spark.stop()
  }
}
