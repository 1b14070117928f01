package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** r14 scratch: print the AQE-final executed plan (post-action) for the
  * triangle core and the winnow pair join, plus the ngram cost-probe
  * value — the initial `explain` hides runtime join strategy changes
  * and exchange reuse. Not part of the driver contract.
  */
object DevOptFinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Tables.{documents, lineitem}

    def finalPlan(df: DataFrame, name: String): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val s = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      println(s"==== $name ====")
      println(s.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Generate") ||
        l.contains("Aggregate") || l.contains("Reused")).mkString("\n"))
    }

    def edgeGroup: DataFrame = {
      val li = lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS u, y AS v))))"))
          .as("e"))
        .select(col("e.u"), col("e.v"))
        .distinct()
    }
    finalPlan(graft.operators.Graph.triangles(edgeGroup, "u", "v"), "triangles(group edges)")

    val shRaw = graft.operators.MinHashLsh
      .shingles(documents(spark, sfDir), "doc_id", "text")
      .withColumnRenamed("shingle", "sh")
    val jr = shRaw.groupBy("sh").agg(count(lit(1)).as("df"))
      .agg(coalesce(sum(col("df") * col("df")), lit(0L)))
      .collect()(0).getLong(0)
    println(s"==== ngram joinRows at sf0.1 = $jr (threshold 200000000) ====")
    val sh = shRaw.count()
    println(s"==== shingle rows = $sh ====")
    spark.stop()
  }
}
