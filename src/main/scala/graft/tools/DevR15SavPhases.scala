package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 scratch: phase attribution for spss_compress_roundtrip — times the
  * .sav write and the read-back aggregate separately, and the write's
  * sub-phases (compress pre-pass, width agg, encode) via repeated calls.
  * Not part of the driver contract. */
object DevR15SavPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Tables.orders

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f")
      r
    }

    val path = "/tmp/graft_r15_phase.sav"
    val src = orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_custkey").cast("string").as("custkey_str"),
        (col("o_orderkey") % 2 === 0).cast("double").as("even_flag"),
        col("o_orderdate").cast("timestamp_ntz").as("od_ts"))
    println(s"[phase] partitions=${src.rdd.getNumPartitions} rows=${src.count()}")
    (0 until 3).foreach { r =>
      println(s"[phase] --- round $r")
      t("write compress+checkString") {
        src.write.format("readstat")
          .option("compress", "true").option("compressCheckString", "true")
          .mode("overwrite").save(path)
      }
      t("write plain") {
        src.write.format("readstat")
          .mode("overwrite").save(path + ".plain.sav")
      }
      t("read+agg") {
        spark.read.format("readstat").load(path)
          .groupBy("o_orderstatus").agg(count(lit(1))).collect()
      }
    }
    spark.stop()
  }
}
