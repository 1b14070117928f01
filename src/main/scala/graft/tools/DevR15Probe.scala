package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** r15 scratch: per-job wall-time breakdown of one registry query —
  * names each job with its callsite so serial single-task chains
  * (write/read roundtrips) can be attributed. Not part of the driver
  * contract. Usage: runMain graft.tools.DevR15Probe <query> [sfDir]
  */
object DevR15Probe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "spss_compress_roundtrip"
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, desc) =>
          lines.add(f"[job] ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f  $desc")
        }
      }
    })

    val fn = graft.SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // warm
    (0 until 2).foreach { r =>
      lines.clear()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[probe] $name run $r total=$dt%.3f")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
