package graft.tools
import org.apache.spark.sql.SparkSession
object DevProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Text.ngramJaccardPairs(spark, "/root/testdata/sf0.001").count()
    val t0 = System.nanoTime()
    val n = graft.queries.Text.ngramJaccardPairs(spark, "/root/testdata/sf0.1").count()
    println(f"jaccard sf0.1: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    spark.stop()
  }
}
