package graft.tools
import org.apache.spark.sql.SparkSession
object DevProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val f = "/root/reference/crates/polars_readstat_rs/tests/sas/data/info_nulls.sas7bdat"
    val df = spark.read.format("readstat")
      .option("informativeNulls", "true")
      .option("rowIndexName", "_idx").load(f)
    df.show(8, truncate = 12)
    // probe: bogus option value
    try {
      spark.read.format("readstat").option("partitionTargetBytes", "garbage").load(f).count()
      println("PROBE: no error on garbage partitionTargetBytes")
    } catch { case e: Throwable => println("PROBE err: " + e.getMessage.take(80)) }
    spark.stop()
  }
}
