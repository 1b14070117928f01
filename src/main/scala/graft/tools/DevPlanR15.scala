package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the r15 optimization targets into
  * plans/r15/<query>_<suffix>.txt (suffix = args(0), "before"/"after").
  * Same shape as DevPlanR14; separate so each round's evidence set is
  * immutable. Not part of the driver contract.
  */
object DevPlanR15 {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "text_decontaminate", "dedup_winnow_pairs", "q22_recursive_clusters",
      "spss_compress_roundtrip", "sim_sparse_cosine", "dir_offset_slice",
      "stata_dropmalformed_dir", "dedup_ngram_jaccard", "dedup_containment",
      "dedup_clusters", "dedup_keep_best", "sample_leakage_split",
      "graph_pagerank", "dedup_lsh_recall")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new java.io.File("plans/r15")
    outDir.mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[plan] $name: NO SUCH QUERY")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val f = new java.io.File(outDir, s"${name}_$suffix.txt")
            java.nio.file.Files.write(f.toPath, txt.getBytes("UTF-8"))
            println(s"[plan] wrote ${f.getPath} (${txt.length} chars)")
          } catch { case e: Throwable =>
            println(s"[plan] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
