package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B timing harness for the dedup-family drift bisect (round-10
  * verdict item 3): times the four drifted registry queries min-of-3
  * after a warm run, so two builds (e.g. tokenizer regex variants) can
  * be compared on an idle machine. Not part of the contract. */
object DevDedupProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_winnow_pairs", "dedup_lsh_recall",
        "dedup_ngram_jaccard", "dedup_containment")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      val runs = Seq.fill(3) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[dedupprof] $n%-22s min=${runs.min}%.3f runs=" +
        runs.map(r => f"$r%.3f").mkString(","))
    }
    spark.stop()
  }
}
