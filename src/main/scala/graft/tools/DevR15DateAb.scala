package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 scratch: one arm of the interleaved 8-vs-32-core A/B for the
  * stata_date_subset_50m anomaly (r14 verdict "What's wrong" #3: the
  * 32-core run measured 2.7× SLOWER than 8-core on an untouched
  * 2-column read; contamination suspected but a real 32-way I/O convoy
  * on 16 MB partitions not excluded). The OUTER interleaving runs in
  * bash: alternate SPARK_GRAFT_CPUS=8 / 32 invocations so each arm's
  * samples are minutes apart and a neighbor-sandbox burst inflates one
  * ROUND, not one arm. Each invocation prints a single [dateab] line
  * with its own CPU+IO sentinel readings so contaminated rounds are
  * discountable. Optional arg: partitionTargetBytes (default 16 MB,
  * the bench's value). Not part of the driver contract.
  */
object DevR15DateAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ptb = if (args.nonEmpty) args(0) else "16777216"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val dtaDate = s"/tmp/graft_bench/${tag}_big_date50_v1.dta"
    require(new java.io.File(dtaDate).exists(),
      s"$dtaDate missing — run graft.Bench once first")

    def read(): Long = spark.read.format("readstat")
      .option("partitionTargetBytes", ptb).load(dtaDate)
      .select("ship_date", "l_extendedprice")
      .agg(count(col("ship_date")), count(col("l_extendedprice")))
      .collect()(0).getLong(0)

    def cpuSentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).agg(sum(col("id"))).collect()
      (System.nanoTime() - t0) / 1e9
    }

    read() // warm (page cache + codegen)
    cpuSentinel()
    val runs = (0 until 5).map { _ =>
      val t0 = System.nanoTime()
      read()
      (System.nanoTime() - t0) / 1e9
    }
    val s = cpuSentinel()
    val nParts = spark.read.format("readstat")
      .option("partitionTargetBytes", ptb).load(dtaDate)
      .select("ship_date").rdd.getNumPartitions
    println(f"[dateab] cpus=$cpus ptb=$ptb parts=$nParts " +
      f"min=${runs.min}%.3f med=${runs.sorted.apply(2)}%.3f " +
      f"runs=${runs.map(x => f"$x%.3f").mkString(",")} sentinel=$s%.3f")
    spark.stop()
  }
}
