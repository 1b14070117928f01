package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // `runMain graft.Profile <queryName>`: time one SparkEntry query and exit
    if (args.nonEmpty) {
      val name = args(0)
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => }
      val runs = (0 until 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name min=${runs.min}%.3f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      spark.stop()
      return
    }

    def time(name: String)(f: => Any): Unit = {
      val runs = (0 until 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }

    // raw-read decomposition over the 10M-row bench dta (if present)
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val dta = s"/tmp/graft_bench/${tag}_big.dta"
    if (new java.io.File(dta).exists()) {
      def rd = spark.read.format("readstat")
        .option("partitionTargetBytes", "16777216").load(dta)
      rd.count() // warm
      time("fullread toRdd.count") {
        rd.queryExecution.toRdd.count()
      }
      time("fullread hash-all") {
        val df = rd
        df.agg(expr("bit_xor(" + df.columns.map(c => s"xxhash64(`$c`)").mkString(" ^ ") + ")"))
          .collect()
      }
      time("fullread sum-2cols") {
        rd.agg(sum("l_quantity"), sum("l_extendedprice")).collect()
      }
    }

    // warmup
    graft.queries.Text.ngramJaccardPairs(spark, "/root/testdata/sf0.001").count()

    val sh = graft.operators.MinHashLsh
      .shingles(graft.queries.Tables.documents(spark, sfDir), "doc_id", "text")
      .withColumnRenamed("shingle", "sh")
    time("shingles count")(sh.count())
    time("shingles cache+count") { val c = sh.cache(); c.count(); c.unpersist() }
    time("sizes agg")(sh.groupBy("doc_id").agg(count(lit(1))).count())
    time("dfc agg")(sh.groupBy("sh").agg(count(lit(1))).count())
    val dfc = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    time("naive self-join") {
      val shared = dfc.filter(col("df") > 1).select("sh")
      val shF = sh.join(shared, "sh")
      shF.as("a").join(shF.as("b"), col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1))).count()
    }
    time("full ngramJaccardPairs")(
      graft.queries.Text.ngramJaccardPairs(spark, sfDir).count())
    spark.stop()
  }
}
