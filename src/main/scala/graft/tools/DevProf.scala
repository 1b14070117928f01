package graft.tools
import org.apache.spark.sql.SparkSession
object DevProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq((1.0, "alpha"), (2.0, "beta"), (3.0, "gamma")).toDF("v", "s")
    df.write.format("readstat").mode("overwrite")
      .option("valueLabels", "v:1=One,2=Two")
      .save("/tmp/graft_dev/probe.zsav")
    println("header magic: " + new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/tmp/graft_dev/probe.zsav")).take(4).toArray, "ascii"))
    val back = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load("/tmp/graft_dev/probe.zsav")
    back.show()
    spark.stop()
  }
}
