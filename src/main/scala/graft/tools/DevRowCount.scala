package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints row counts of named registry queries at a scale factor — used
  * for the non-vacuousness record in COVERAGE.md. Not contract code. */
object DevRowCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("text_inverted_index")
    names.foreach { n =>
      println(s"[rowcount] $n@$sfDir = " +
        graft.SparkEntry.queries(n)(spark, sfDir).count())
    }
    spark.stop()
  }
}
