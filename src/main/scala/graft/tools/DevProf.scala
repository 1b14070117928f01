package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DevProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sav = "/tmp/graft_bench/_root_testdata_sf0_1_big.sav"
    val df = spark.read.format("readstat")
      .option("partitionTargetBytes", "16777216").load(sav)
    println("rows=" + df.count())
    try {
      val h = df.agg(sum(xxhash64(df.columns.map(col).toIndexedSeq: _*))).collect()(0)
      println("hash=" + h)
    } catch { case e: Throwable => println("ERR " + e.getMessage) }
    spark.stop()
  }
}
