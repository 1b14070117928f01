package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the 50M-row subset-read anomaly (not driver contract). */
object Profile50 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = args.headOption.getOrElse(
      "/tmp/graft_bench/_root_testdata_sf0_01_big50_v2.dta")
    def scan = spark.read.format("readstat")
      .option("partitionTargetBytes", "16777216").load(path)
    scan.select("l_quantity").agg(count(col("l_quantity"))).collect() // warm
    scan.queryExecution.toRdd.count()                                 // warm
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def time(name: String)(f: => Any): Unit = {
      val rs = (0 until 3).map { _ =>
        val g0 = gcMillis
        val t0 = System.nanoTime(); f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, (gcMillis - g0) / 1e3)
      }
      println(f"[p] $name%-22s min=${rs.map(_._1).min}%.3f " +
        rs.map { case (t, g) => f"$t%.2f(gc $g%.2f)" }.mkString(","))
    }
    time("fullread")(scan.queryExecution.toRdd.count())
    time("subset2_count")(scan.select("l_quantity", "l_returnflag")
      .agg(count(col("l_quantity")), count(col("l_returnflag"))).collect())
    time("subset1_count")(scan.select("l_quantity")
      .agg(count(col("l_quantity"))).collect())
    time("subset2_sum")(scan
      .agg(sum("l_quantity"), count(col("l_returnflag"))).collect())
    spark.stop()
  }
}
