package graft.tools

import org.apache.spark.sql.SparkSession

/** Materialize the bench input files (/tmp/graft_bench) without running
  * the bench — used by the r13 A/B harness so both code versions read
  * byte-identical inputs generated once, outside any timed section.
  *
  *   sbt "runMain graft.tools.GenBenchFiles"
  */
object GenBenchFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val files = graft.Bench.ensureBigFiles(spark, sfDir)
    val sas = graft.Bench.ensureSasDir()
    val sasWide = graft.Bench.ensureSasWide(spark)
    println(s"bench files: $files")
    println(s"sas dir: $sas")
    println(s"sas wide: $sasWide")
    spark.stop()
  }
}
