package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 scratch: INTERLEAVED A/B comparison of optimization variants —
  * round-robin execution with a CPU sentinel per round, the
  * PROFILE_AB methodology, because this machine's neighbor-sandbox
  * load bursts make back-to-back triples lie (a burst inflates one
  * variant's whole triple and reads as a 3x "win" for whatever ran
  * later). Not part of the driver contract.
  *
  * Usage: runMain graft.tools.DevOptAb <suite> [rounds]
  * Suites: winnow | ngram | dirwrite
  */
object DevOptAb {
  def main(args: Array[String]): Unit = {
    val suite = if (args.nonEmpty) args(0) else "winnow"
    val rounds = if (args.length > 1) args(1).toInt else 5
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
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).agg(sum(col("id"))).collect()
      (System.nanoTime() - t0) / 1e9
    }

    val k = 8; val w = 8
    val nP = spark.sessionState.conf.numShufflePartitions

    // winnowPairs body parameterized on the self-join strategy hint
    def winnowBody(hint: Option[String]): DataFrame = {
      val fps = documents(spark, sfDir)
        .select(col("doc_id"),
          explode(graft.functions.WinnowSketch(col("text"), k, w)).as("mh"))
        .filter(col("doc_id").isNotNull && col("mh").isNotNull)
        .repartition(nP, col("mh"))
      val nDocs = documents(spark, sfDir).count()
      val dfCap = math.max(50L, nDocs / 10)
      val sizes = fps.groupBy("doc_id").agg(count(col("mh")).as("sz"))
      val rare = fps.groupBy("mh").agg(count(col("doc_id")).as("df"))
        .filter(col("df") > 1 && col("df") <= dfCap)
        .select("mh")
      val fpsF = fps.join(rare, "mh")
      val b = hint.map(h => fpsF.as("b").hint(h)).getOrElse(fpsF.as("b"))
      fpsF.as("a").join(b,
          col("a.mh") === col("b.mh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
        .withColumn("frac",
          round(col("n_shared") / least(col("sz_a"), col("sz_b")), 4))
        .filter(col("frac") >= 0.5)
        .select(col("id_a"), col("id_b"), col("n_shared"), col("frac"))
        .orderBy("id_a", "id_b")
    }

    val variants: Seq[(String, () => Unit)] = suite match {
      case "winnow" => Seq(
        ("winnow default join", () => noop(winnowBody(None))),
        ("winnow SHUFFLE_MERGE", () => noop(winnowBody(Some("SHUFFLE_MERGE")))),
        ("winnow SHUFFLE_HASH", () => noop(winnowBody(Some("SHUFFLE_HASH")))))
      // r15: old self-join shape (winnowBody None = the pre-r15
      // production body) vs the current set-expansion production path
      case "winnow15" => Seq(
        ("winnow OLD self-join", () => noop(winnowBody(None))),
        ("winnow NEW doc-set expansion", () =>
          noop(graft.queries.Text.winnowPairs(spark, sfDir))))
      case "containment15" => Seq(
        ("containment OLD self-join", () => {
          // pre-r15 direct branch, inlined: df>1 filter join + self-join
          val shRaw = graft.operators.MinHashLsh
            .shingles(documents(spark, sfDir), "doc_id", "text")
            .withColumnRenamed("shingle", "sh")
          val sh = shRaw
            .filter(col("doc_id").isNotNull && col("sh").isNotNull)
            .repartition(col("sh"))
          val sizes = sh.groupBy("doc_id").agg(count(col("sh")).as("n_sh"))
          val dfc = sh.groupBy("sh").agg(count(col("doc_id")).as("df"))
          val shF = sh.join(dfc.filter(col("df") > 1).select("sh"), "sh")
          val inter = shF.as("a").join(shF.as("b"), col("a.sh") === col("b.sh") &&
              col("a.doc_id") < col("b.doc_id"))
            .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
            .agg(count(lit(1)).as("n_int"))
          noop(inter
            .join(sizes.withColumnRenamed("doc_id", "id_a")
              .withColumnRenamed("n_sh", "n_a"), "id_a")
            .join(sizes.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
            .withColumn("containment",
              round(col("n_int").cast("double") / least(col("n_a"), col("n_b")), 4))
            .filter(col("containment") >= 0.5)
            .select(col("id_a"), col("id_b"), col("containment"))
            .orderBy("id_a", "id_b"))
        }),
        ("containment NEW doc-set expansion", () =>
          noop(graft.queries.Text.containmentPairsImpl(spark, sfDir,
            forcePrefix = Some(false)))))
      case "ngram" => Seq(
        ("ngram pairs (sampled probe)", () =>
          noop(graft.queries.Text.ngramJaccardPairs(spark, sfDir))),
        ("ngram pairs exact branch pinned", () =>
          noop(graft.queries.Text.ngramJaccardPairsImpl(spark, sfDir,
            forcePrefix = Some(false)))))
      case "dirwrite" => Seq(
        ("dir_offset_slice (new)", () =>
          graft.SparkEntry.queries("dir_offset_slice")(spark, sfDir).count(): Unit))
      case other => sys.error(s"unknown suite $other")
    }

    // warm each variant once
    variants.foreach(_._2())
    val acc = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    variants.foreach(v => acc(v._1) = Vector())
    val noise = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 0 until rounds) {
      noise += sentinel()
      variants.foreach { case (n, f) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f()
        acc(n) :+= (System.nanoTime() - t0) / 1e9
      }
    }
    def med(v: Seq[Double]): Double = {
      val s = v.sorted; if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    println(f"[ab] sentinel runs=${noise.map(x => f"$x%.2f").mkString(",")}")
    acc.foreach { case (n, v) =>
      println(f"[ab] $n%-34s min=${v.min}%6.3f med=${med(v)}%6.3f runs=${v.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
