package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 scratch: how much of a pair-family query is the shingling scan
  * itself (typed flatMap with its deser/ser boundary), vs the rest of
  * the pipeline? Times the isolated substrate pieces with the noop sink
  * (guide §1.4). Not part of the driver contract. */
object DevR15ShingleCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Tables.documents

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(tag: String)(f: => Unit): Unit = {
      f // warm
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[sh] $tag%-38s min=${runs.min}%6.3f runs=${runs.map(x => f"$x%.2f").mkString(",")}")
    }

    val docs = documents(spark, sfDir)
    t("docs scan only")(noop(docs.select("doc_id", "text")))
    t("shingles flatMap")(noop(
      graft.operators.MinHashLsh.shingles(docs, "doc_id", "text")))
    // HOF-lambda equivalent (the recorded ~3x-slower dead end — re-pin)
    t("shingles HOF transform")(noop(
      docs.select(col("doc_id"),
        explode(array_distinct(expr(
          "CASE WHEN size(split(trim(text), '\\\\s+')) >= 3 THEN " +
            "transform(sequence(1, size(split(trim(text), '\\\\s+')) - 2), " +
            "i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), i, 3))) " +
            "ELSE array() END"))).as("shingle"))))
    // with the split hoisted (one tokenization, then HOF over the array)
    t("shingles HOF split-hoisted")(noop(
      docs.select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("tk"))
        .select(col("doc_id"),
          explode(array_distinct(expr(
            "CASE WHEN size(tk) >= 3 THEN transform(sequence(1, size(tk) - 2), " +
              "i -> concat_ws(' ', slice(tk, i, 3))) ELSE array() END"))).as("shingle"))))
    t("shingles + repartition(sh)")(noop(
      graft.operators.MinHashLsh.shingles(docs, "doc_id", "text")
        .repartition(col("shingle"))))
    t("full ngram pairs (current)")(noop(
      graft.queries.Text.ngramJaccardPairs(spark, sfDir)))
    spark.stop()
  }
}
