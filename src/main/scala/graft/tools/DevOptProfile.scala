package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** r14 optimization scratch profiler (not part of the driver contract):
  * times registry queries at sf0.1 with the bench's own action (count)
  * and reports the physical execution shape — job/stage/task counts and
  * shuffle volume — so overhead-bound queries (many tiny stages) are
  * distinguishable from data-bound ones before anything is changed.
  *
  * `runMain graft.tools.DevOptProfile q1 q2 ...` (no args = the round's
  * target list).
  */
object DevOptProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        shuffleRead += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val targets: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "graph_triangles", "dedup_winnow_pairs", "q22_recursive_clusters",
        "graph_pagerank", "dedup_lsh_recall", "dedup_clusters",
        "sample_leakage_split", "dedup_keep_best", "dedup_ngram_jaccard",
        "dedup_containment", "dir_offset_slice", "stata_dropmalformed_dir",
        "cross_format_join", "spss_compress_roundtrip", "text_decontaminate",
        "dedup_span_flags", "text_tfidf_topk", "text_bigram_logprob",
        "dedup_minhash_lsh", "por_offset_slice", "sim_sparse_cosine",
        "text_langid", "profile_lineitem", "zsav_offset_slice",
        "text_winnow_fingerprint")

    targets.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[opt] $name: NO SUCH QUERY")
        case Some(fn) =>
          try fn(spark, "/root/testdata/sf0.001").count()
          catch { case _: Throwable => }
          val runs = (0 until 3).map { _ =>
            spark.catalog.clearCache()
            jobs = 0; stages = 0; tasks = 0; shuffleRead = 0L; shuffleWrite = 0L
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            // listener events are async; give the bus a beat before reading
            Thread.sleep(150)
            (dt, jobs, stages, tasks, shuffleRead, shuffleWrite)
          }
          val best = runs.minBy(_._1)
          println(f"[opt] $name%-26s min=${best._1}%6.3f runs=${runs.map(r => f"${r._1}%.2f").mkString(",")} " +
            f"jobs=${best._2}%3d stages=${best._3}%3d tasks=${best._4}%5d " +
            f"shufR=${best._5 / 1024}%7dK shufW=${best._6 / 1024}%7dK")
      }
    }
    spark.stop()
  }
}
