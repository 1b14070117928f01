package graft.tools
import org.apache.spark.sql.SparkSession
object DevProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.format("readstat").option("partitionTargetBytes", "garbage")
      .load("/root/repo/src/test/resources/fixtures/spss/sample.sav").count()
    catch { case e: Throwable => println("PROBE: " + e.getMessage.linesIterator.next().take(120)) }
    spark.stop()
  }
}
