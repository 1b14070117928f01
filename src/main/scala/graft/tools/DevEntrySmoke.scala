package graft.tools

/** Replicates the driver's smoke check: SparkEntry.entry at sf0.001
  * must return rows > 0. */
object DevEntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n ${if (n > 0) "OK" else "FAIL"}")
    spark.stop()
  }
}
