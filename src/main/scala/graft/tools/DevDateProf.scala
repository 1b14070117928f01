package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r13 temporal-pushdown bench pair: times the
  * unfiltered 2-column read vs the ~2%-selective date-range filter on
  * the dated 10M dta, prints the scan leaf (PushedFilters must show the
  * two date conjuncts), and compares against the same-selectivity
  * NUMERIC filter on l_quantity to isolate temporal-vs-numeric
  * predicate cost.
  *
  *   sbt "runMain graft.tools.DevDateProf"
  */
object DevDateProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dtaDate = "/tmp/graft_bench/_root_testdata_sf0_1_big_date50_v1.dta"

    def scan() = spark.read.format("readstat")
      .option("partitionTargetBytes", "16777216").load(dtaDate)

    def subsetRead(): Long =
      scan().select("ship_date", "l_extendedprice")
        .agg(count(col("ship_date")), count(col("l_extendedprice")))
        .collect()(0).getLong(0)
    def dateFilter(): Long =
      scan().select("ship_date", "l_extendedprice")
        .filter(col("ship_date") >= lit("1994-01-01").cast("date") &&
          col("ship_date") < lit("1994-02-20").cast("date"))
        .agg(sum(col("l_extendedprice")), count(lit(1)))
        .collect()(0).getLong(1)
    def numFilter(): Long =
      scan().select("l_quantity", "l_extendedprice")
        .filter(col("l_quantity") > 49)
        .agg(sum(col("l_extendedprice")), count(lit(1)))
        .collect()(0).getLong(1)

    // show the scan leaf of the filtered plan
    val fdf = scan().select("ship_date", "l_extendedprice")
      .filter(col("ship_date") >= lit("1994-01-01").cast("date") &&
        col("ship_date") < lit("1994-02-20").cast("date"))
    val leaf = fdf.queryExecution.executedPlan.collectLeaves().head.toString
    println("SCAN LEAF: " + leaf.take(600))

    def time(name: String, f: () => Long, n: Int = 5): Unit = {
      f() // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); val r = f()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, r)
      }
      println(f"$name%-22s min=${ts.map(_._1).min}%.3f runs=${ts.map(t => f"${t._1}%.3f").mkString(",")} rows=${ts.head._2}")
    }
    time("subset_read", subsetRead _)
    time("date_filter_2pct", dateFilter _)
    time("num_filter_2pct", numFilter _)
    spark.stop()
  }
}
