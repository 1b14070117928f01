package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc dev harness for the r13 OFFSET bench showcase: generates the
  * bench big files at a small SF and checks that
  * stata_offset_read_50m's scan claims the offset and slices exactly.
  * (The DPP join showcase has its own harness, DevDppProf, which also
  * reads the scan's numOutputRows — plan text alone can report a
  * dynamic-pruning subquery whose runtime filter translation later
  * drops, so it is NOT checked here.)
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
    }
    spark.stop()
  }
}
