package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r15 scratch: which WriteCompress stat expression is slow? Times the
  * full compress-stats aggregate and per-expression-family subsets over
  * the spss_compress_roundtrip input. Not part of the driver contract. */
object DevR15AggCost {
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

    val src = orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_custkey").cast("string").as("custkey_str"),
        (col("o_orderkey") % 2 === 0).cast("double").as("even_flag"),
        col("o_orderdate").cast("timestamp_ntz").as("od_ts"))

    def t(tag: String)(cols: Seq[Column]): Unit = {
      // warm once, then time twice
      src.agg(cols.head, cols.tail: _*).collect()
      (0 until 2).foreach { _ =>
        val t0 = System.nanoTime()
        src.agg(cols.head, cols.tail: _*).collect()
        println(f"[agg] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f")
      }
    }

    def ps(name: String): Column =
      when(length(trim(col(name))) === 0, lit(null))
        .otherwise(trim(col(name)).try_cast(DoubleType))

    t("count only")(Seq(count(lit(1))))
    t("int col full (i/mn/mx)")(Seq(
      coalesce(bool_and(!isnan(col("o_orderkey").cast(DoubleType)) &&
        abs(col("o_orderkey").cast(DoubleType)) =!= lit(Double.PositiveInfinity) &&
        col("o_orderkey").cast(DoubleType) === round(col("o_orderkey").cast(DoubleType))), lit(true)),
      min(col("o_orderkey").cast(DoubleType)), max(col("o_orderkey").cast(DoubleType))))
    t("string parse stats (custkey)")(Seq(
      count(ps("custkey_str")),
      coalesce(bool_and(!isnan(ps("custkey_str").cast(DoubleType)) &&
        abs(ps("custkey_str").cast(DoubleType)) =!= lit(Double.PositiveInfinity) &&
        ps("custkey_str").cast(DoubleType) === round(ps("custkey_str").cast(DoubleType))), lit(true)),
      min(ps("custkey_str").cast(DoubleType)), max(ps("custkey_str").cast(DoubleType)),
      coalesce(bool_and(length(trim(col("custkey_str"))) === 0 ||
        trim(col("custkey_str")).try_cast(DoubleType).isNotNull), lit(true))))
    t("ntz midnight check")(Seq(
      coalesce(bool_and(col("od_ts") === date_trunc("DAY", col("od_ts"))), lit(true))))
    t("status string count")(Seq(count(col("o_orderstatus"))))
    t("even_flag stats")(Seq(
      coalesce(bool_and(!isnan(col("even_flag")) &&
        abs(col("even_flag")) =!= lit(Double.PositiveInfinity) &&
        col("even_flag") === round(col("even_flag"))), lit(true)),
      min(col("even_flag")), max(col("even_flag"))))
    spark.stop()
  }
}
