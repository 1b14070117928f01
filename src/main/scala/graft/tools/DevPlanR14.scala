package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the r14 optimization targets into
  * plans/r14/<query>_<suffix>.txt (suffix = args(0), "before"/"after").
  * Separate from PlanDump (PLANS.md) so the optimization round's
  * before/after evidence is per-file and diffable. Not part of the
  * driver contract.
  */
object DevPlanR14 {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "graph_triangles", "dedup_winnow_pairs", "q22_recursive_clusters",
      "graph_pagerank", "dedup_lsh_recall", "dedup_clusters",
      "sample_leakage_split", "dedup_keep_best", "dedup_ngram_jaccard",
      "dedup_containment", "dir_offset_slice", "stata_dropmalformed_dir",
      "cross_format_join", "spss_compress_roundtrip", "text_decontaminate",
      "dedup_span_flags", "dedup_minhash_lsh", "text_tfidf_topk")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new java.io.File("plans/r14")
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
