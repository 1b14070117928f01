package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of ngramJaccardPairs at sf0.1 (dev scratch). */
object DevNgramProf {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm
    graft.queries.Text.ngramJaccardPairs(spark, d).count()
    spark.catalog.clearCache()

    val sh = t("shingles build+cache+count") {
      val s = graft.operators.MinHashLsh
        .shingles(graft.queries.Tables.documents(spark, d), "doc_id", "text")
        .withColumnRenamed("shingle", "sh").cache()
      println("  shingle rows: " + s.count())
      s
    }
    val dfc = t("dfc agg") {
      val x = sh.groupBy("sh").agg(count(lit(1)).as("df")).cache()
      println("  distinct shingles: " + x.count())
      x
    }
    t("joinRows stat") {
      println("  sum df^2 = " + dfc.agg(sum(col("df") * col("df"))).collect()(0).getLong(0))
    }
    t("index self-join + agg") {
      val shF = sh.join(dfc.filter(col("df") > 1).select("sh"), "sh")
      val n = shF.as("a").join(shF.as("b"), col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("n_int")).count()
      println("  intersecting pairs: " + n)
    }
    t("explain inter join") {
      val shF0 = sh.join(dfc.filter(col("df") > 1).select("sh"), "sh")
      val plan0 = shF0.as("a").join(shF0.as("b"), col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("n_int")).queryExecution.executedPlan.toString
      println(plan0.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate"))
        .mkString("\n"))
    }
    t("variant A: cached shF") {
      val shF = sh.join(dfc.filter(col("df") > 1).select("sh"), "sh").cache()
      shF.count()
      val n = shF.as("a").join(shF.as("b"), col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("n_int")).count()
      println("  pairs: " + n)
      shF.unpersist()
    }
    t("variant B: grouped pair explode") {
      val spark2 = spark
      import spark2.implicits._
      val lists = sh.join(dfc.filter(col("df") > 1).select("sh"), "sh")
        .groupBy("sh").agg(collect_list("doc_id").as("ids"))
        .select("ids").as[Seq[Long]]
      val pairs = lists.flatMap { ids =>
        val a = ids.toArray
        java.util.Arrays.sort(a)
        for {
          i <- a.indices.iterator
          j <- Iterator.range(i + 1, a.length)
        } yield (a(i), a(j))
      }
      val n = pairs.groupByKey(identity).count().count()
      println("  pairs: " + n)
    }
    t("full query (cold cache)") {
      spark.catalog.clearCache()
      graft.queries.Text.ngramJaccardPairs(spark, d).count()
    }
    t("dedup_clusters (cold cache)") {
      spark.catalog.clearCache()
      graft.queries.Text.dedupClusters(spark, d).count()
    }
    spark.stop()
  }
}
