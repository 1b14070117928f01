package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproduces the alias self-join elimination seen in corpus_overlap
  * (scratch, not driver contract): same h.as("a")/as("b") shape on data
  * with planted cross-source duplicates — does the join survive, and
  * does it return the right counts?
  */
object DevSelfJoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Seq(
      ("a", "x"), ("a", "y"), ("a", "z"),
      ("b", "x"), ("b", "y"), ("b", "q"),
      ("c", "only c")).toDF("source", "text")

    val h = docs.select(col("source"),
        md5(lower(regexp_replace(trim(col("text")), graft.queries.Tables.Ws, " "))).as("fp"))
      .distinct()

    // formulation 1: alias self-join (the shape that got eliminated)
    val inter1 = h.as("a").join(h.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    println("[selfjoin] alias form rows: " + inter1.collect().mkString(", "))
    val plan1 = inter1.queryExecution.executedPlan.toString
    println("[selfjoin] alias form has join: " + plan1.contains("Join"))

    // formulation 2: toDF-renamed sides (the fix)
    val inter2 = h.toDF("src_a", "fp").join(h.toDF("src_b", "fp"), Seq("fp"))
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
    println("[selfjoin] renamed form rows: " + inter2.collect().mkString(", "))
    spark.stop()
  }
}
