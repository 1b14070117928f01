package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 scratch: component-level attribution for the expensive pipeline
  * queries — times each building block with the noop sink so the cost
  * of a 3-5 s query is split into (scan+expression, exchange, join,
  * probe action) parts before anything is rewritten. Not part of the
  * driver contract.
  */
object DevOptComponents {
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
    import graft.queries.Tables.documents

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val runs = (0 until 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[cmp] $name%-34s min=${runs.min}%6.3f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }

    val k = 8; val w = 8

    time("documents.count") { documents(spark, sfDir).count(); () }

    time("winnow sketch noop (no explode)") {
      noop(documents(spark, sfDir).select(col("doc_id"),
        graft.functions.WinnowSketch(col("text"), k, w).as("sk")))
    }

    time("winnow fps explode noop") {
      noop(documents(spark, sfDir).select(col("doc_id"),
        explode(graft.functions.WinnowSketch(col("text"), k, w)).as("mh")))
    }

    time("winnow fps repartition noop") {
      val nP = spark.sessionState.conf.numShufflePartitions
      noop(documents(spark, sfDir).select(col("doc_id"),
        explode(graft.functions.WinnowSketch(col("text"), k, w)).as("mh"))
        .filter(col("doc_id").isNotNull && col("mh").isNotNull)
        .repartition(nP, col("mh")))
    }

    time("winnowPairs full") {
      noop(graft.queries.Text.winnowPairs(spark, sfDir))
    }

    time("shingles flatMap noop") {
      noop(graft.operators.MinHashLsh.shingles(
        documents(spark, sfDir), "doc_id", "text"))
    }

    time("ngram joinRows probe") {
      val shRaw = graft.operators.MinHashLsh
        .shingles(documents(spark, sfDir), "doc_id", "text")
        .withColumnRenamed("shingle", "sh")
      shRaw.groupBy("sh").agg(count(lit(1)).as("df"))
        .agg(coalesce(sum(col("df") * col("df")), lit(0L)))
        .collect()(0).getLong(0)
      ()
    }

    time("ngramJaccardPairs full") {
      noop(graft.queries.Text.ngramJaccardPairs(spark, sfDir))
    }

    // triangles decomposition over the lineitem co-occurrence graph
    import graft.queries.Tables.lineitem
    def edges: DataFrame = {
      val li = lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
    }
    time("tri edge build noop") { noop(edges) }
    time("tri edge count") { println("  edges=" + edges.count()) }
    time("tri full noop") {
      noop(graft.operators.Graph.triangles(edges, "u", "v"))
    }
    spark.stop()
  }
}
