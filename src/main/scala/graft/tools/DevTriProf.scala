package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing harness for the triangle query at a scale factor: min-of-3
  * after one warm run, so ambient-load bursts are visible. */
object DevTriProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime()
      f()
      (System.nanoTime() - t0) / 1e9
    }
    // phase split: edge build (intra-order self-join + distinct) vs the
    // compact-forward triangle enumeration that consumes it
    def edges() = {
      val li = spark.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
    }
    def full(): Unit = { graft.queries.Analytics.graphTriangles(spark, d).collect(); () }
    def edgeOnly(): Unit = { edges().queryExecution.toRdd.count(); () }
    full(); edgeOnly() // warm
    val fullRuns = Seq.fill(3)(time(full))
    val edgeRuns = Seq.fill(3)(time(edgeOnly))
    println(f"[triprof] full=${fullRuns.map(r => f"$r%.2f").mkString(",")} min=${fullRuns.min}%.2f s " +
      f"edges=${edgeRuns.map(r => f"$r%.2f").mkString(",")} min=${edgeRuns.min}%.2f s " +
      f"(n_edges=${edges().count()})")
    spark.stop()
  }
}
