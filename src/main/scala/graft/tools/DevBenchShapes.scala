package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc dev harness for the r13 bench showcases: generates the bench
  * big files at a small SF and checks that stata_offset_read_50m's scan
  * claims the offset and stata_runtime_prune_50m's plan carries the
  * dynamic-pruning runtime filter.
  * Usage: runMain graft.tools.DevBenchShapes [sfDir]
  */
object DevBenchShapes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bigFiles = graft.Bench.ensureBigFiles(spark, sfDir)
    def scan(p: String) = spark.read.format("readstat")
      .option("partitionTargetBytes", "16777216").load(p)
    bigFiles.foreach { case (_, _, dta50, _, _, _, _, _) =>
      val n50 = scan(dta50).count()
      val off90 = (n50 * 9L / 10L).toInt
      println(s"n50=$n50 off90=$off90")
      val offDf = scan(dta50).offset(off90)
        .select("l_quantity", "l_returnflag")
        .agg(count(col("l_quantity")), count(col("l_returnflag")))
      val got = offDf.collect()(0).getLong(0)
      println(s"offset rows=$got expect=${n50 - off90}")
      val leaves = offDf.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString
      println("OFFSET_PUSHED=" + leaves.contains(s"offset=$off90"))

      val dimPath = s"${dta50.stripSuffix(".dta")}_qdim.parquet"
      scan(dta50).select(col("l_quantity")).distinct()
        .withColumn("hot", (col("l_quantity") === 3 || col("l_quantity") === 41).cast("int"))
        .coalesce(1).write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath)
        .filter(col("hot") === 1).select(col("l_quantity").as("qk"))
      val j = scan(dta50).select("l_quantity", "l_extendedprice")
        .join(dim, col("l_quantity") === col("qk"))
        .agg(sum(col("l_extendedprice")), count(lit(1)))
      val cnt = j.collect()(0).getLong(1)
      println(s"join rows=$cnt")
      println("HAS_DPP=" + j.queryExecution.executedPlan.toString
        .contains("dynamicpruning"))
    }
    spark.stop()
  }
}
