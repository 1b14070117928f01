package graft.tools
import org.apache.spark.sql.SparkSession
object DevProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("=== q3_shipping plan")
    graft.queries.Relational.q3Shipping(spark, "/root/testdata/sf0.01").explain("formatted")
    println("=== readstat pushdown plan")
    val df = spark.read.format("readstat")
      .load("/root/repo/src/test/resources/fixtures/sas/owner.sas7bdat")
      .select("CONTROL")
    df.explain("formatted")
    spark.stop()
  }
}
