package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc dev harness: exercise the r14 bench additions (wide single
  * SAS file, directory offset, selective-DPP pair) before they enter
  * the certified record — validates the closures end-to-end and gives
  * a first timing read.
  * Usage: runMain graft.tools.DevR14Shapes [sfDir]
  */
object DevR14Shapes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scan(p: String) = spark.read.format("readstat")
      .option("partitionTargetBytes", "16777216").load(p)
    def time(name: String, f: () => Long, n: Int = 3): Unit = {
      val r0 = f() // warm
      val ts = (1 to n).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[r14] $name%-24s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")} rows=$r0")
    }

    graft.Bench.ensureSasWide(spark).foreach { w =>
      time("sas_wide_fullread", () => scan(w).queryExecution.toRdd.count())
      time("sas_wide_subset", () => scan(w).select("C3", "C7")
        .agg(count(col("C3")), count(col("C7"))).collect()(0).getLong(0))
    }
    graft.Bench.ensureSasDir().foreach { d =>
      val total = scan(d).agg(count(lit(1))).collect()(0).getLong(0)
      val off90 = (total * 9L / 10L).toInt
      time("sas_dir1000_offset", () =>
        scan(d).offset(off90).queryExecution.toRdd.count())
      time("sas_dir1000_fullread", () =>
        scan(d).queryExecution.toRdd.count())
    }
    graft.Bench.ensureBigFiles(spark, sfDir).foreach {
      case (_, _, dta50, _, _, _, _, _) =>
        val key50 = s"${dta50.stripSuffix(".dta")}_key.dta"
        val dimPath = s"${dta50.stripSuffix(".dta")}_qdim.parquet"
        if (new java.io.File(key50).exists()) {
          spark.range(1, 51)
            .select(col("id").cast("int").as("q_code"))
            .withColumn("hot",
              (col("q_code") === 3 || col("q_code") === 41).cast("int"))
            .coalesce(1).write.mode("overwrite").parquet(dimPath)
          time("dpp_hot_on", () =>
            graft.Bench.dppHotJoin(spark, key50, dimPath))
          time("dpp_hot_off", () => {
            val k = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
            spark.conf.set(k, "false")
            try graft.Bench.dppHotJoin(spark, key50, dimPath)
            finally spark.conf.set(k, "true")
          })
        }
    }
    spark.stop()
  }
}
