package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the winnow-pairs plan (not part of the contract). */
object DevWinnowProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[wprof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
    }

    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs count")(docs.count())
    val fps = docs.select(col("doc_id"),
      explode(graft.functions.WinnowSketch(col("text"), 8, 8)).as("mh"))
    time("fps count (uncached)")(fps.count())
    val fpsC = fps.cache()
    time("fps materialize")(fpsC.count())
    time("fps count again (cached)")(fpsC.count())
    val nDocs = 5000L
    val dfCap = math.max(50L, nDocs / 10)
    val rare = fpsC.groupBy("mh").agg(count(lit(1)).as("df"))
      .filter(col("df") > 1 && col("df") <= dfCap)
    time("rare mh count")(rare.count())
    time("sum df^2")(rare.agg(sum(col("df") * col("df"))).collect()(0).get(0))
    val fpsF = fpsC.join(rare.select("mh"), "mh").cache()
    time("fpsF materialize")(fpsF.count())
    time("self-join row count")(
      fpsF.as("a").join(fpsF.as("b"),
        col("a.mh") === col("b.mh") && col("a.doc_id") < col("b.doc_id")).count())
    time("pair agg count")(
      fpsF.as("a").join(fpsF.as("b"),
        col("a.mh") === col("b.mh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1))).count())
    // prefix-filter experiment: overlap >= ceil(0.5 * min(full sizes))
    import org.apache.spark.sql.expressions.Window
    val sizes = fpsC.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val dfs = fpsC.groupBy("mh").agg(count(lit(1)).as("df"))
    val fpsF2 = fpsC.join(dfs.filter(col("df") > 1 && col("df") <= dfCap), "mh")
    val ranked = fpsF2
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "mh")))
      .withColumn("nrare", count(lit(1)).over(Window.partitionBy("doc_id")))
      .join(sizes, "doc_id")
      .withColumn("need", ceil(col("sz") * 0.5))
    val prefix = ranked.filter(col("rk") <= col("nrare") - col("need") + 1)
      .cache()
    time("prefix rows")(prefix.count())
    val cand = prefix.as("a").join(ranked.as("b"),
      col("a.mh") === col("b.mh") &&
        (col("a.sz") < col("b.sz") ||
          (col("a.sz") === col("b.sz") && col("a.doc_id") < col("b.doc_id"))))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
    time("prefix-join rows")(cand.count())
    time("candidate pairs")(cand.distinct().count())
    val candPos = prefix.as("a").join(ranked.as("b"),
      col("a.mh") === col("b.mh") &&
        (col("a.sz") < col("b.sz") ||
          (col("a.sz") === col("b.sz") && col("a.doc_id") < col("b.doc_id"))) &&
        (lit(1) + least(col("a.nrare") - col("a.rk"), col("b.nrare") - col("b.rk"))
          >= col("a.need")))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
    time("pos-filtered join rows")(candPos.count())
    time("pos-filtered candidates")(candPos.distinct().count())
    val q = graft.queries.Text.winnowPairs(spark, sfDir)
    time("winnow_pairs full (warm fps)")(q.count())
    spark.stop()
  }
}
