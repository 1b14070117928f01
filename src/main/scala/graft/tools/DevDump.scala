package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump a readstat-read file to parquet for external (pandas) comparison.
  * Usage: runMain graft.tools.DevDump <in> <outParquetDir>
  */
object DevDump {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args.take(2)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var df = spark.read.format("readstat")
    args.drop(2).grouped(2).foreach { case Array(k, v) => df = df.option(k, v); case _ => }
    df.load(in).coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
