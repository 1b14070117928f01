package graft.tools
import org.apache.spark.sql.SparkSession
object DevProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = spark.read.format("readstat")
        .option("timeAsTimeType", "true")
        .load("/root/repo/src/test/resources/fixtures/spss/sample.sav")
        .select("mychar", "mytime")
      df.printSchema()
      df.show()
      println("collected: " + df.collect()(1).get(1))
    } catch { case e: Throwable => println("TIMETYPE ERR: " + e.toString.take(300)) }
    spark.stop()
  }
}
