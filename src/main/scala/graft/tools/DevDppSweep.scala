package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 runtime-filter (DPP) selectivity ladder — the crossover evidence
  * the r13 verdict asked for: the committed bench pair only ever showed
  * the CONSTANT machinery cost (subquery + broadcast + re-plan) against
  * a hand-written isin; the real star-join comparator is the same join
  * with runtime filtering disabled, because a query author does not
  * know the dim's surviving keys. This harness times ON vs OFF at a
  * ladder of dimension selectivities (k of the 50 uniform fact keys
  * surviving) and reports mins + the scan's actual numOutputRows, so
  * SCALING.md can state WHERE the runtime filter wins and by how much.
  *
  * The dim carries a shuffled non-key ordinal `ord` and each rung
  * filters `ord <= k` — filtering on the join key itself would let
  * Catalyst infer a static fact-side predicate and the rung would stop
  * measuring runtime pruning.
  *
  * Appends one JSON line per rung to the output file (arg 1, default
  * DPP_SWEEP_R14.json):
  *   {"keys":k,"sel_rows":…,"on_min":…,"on_runs":[…],"off_min":…,
  *    "off_runs":[…],"scan_rows_on":…,"scan_rows_off":…}
  *
  *   sbt "runMain graft.tools.DevDppSweep"
  */
object DevDppSweep {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("DPP_SWEEP_R14.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scan(p: String) = spark.read.format("readstat")
      .option("partitionTargetBytes", "16777216").load(p)

    val bigFiles = graft.Bench.ensureBigFiles(spark, sfDir)
    val dta50 = bigFiles.map(_._3).getOrElse(sys.error("no bench files"))
    val key50 = s"${dta50.stripSuffix(".dta")}_key.dta"
    val n50 = scan(dta50).count()
    val keyValid = new java.io.File(key50).exists() &&
      (try scan(key50).agg(count(lit(1))).collect()(0).getLong(0) == n50
       catch { case _: Throwable => false })
    if (!keyValid)
      scan(dta50)
        .withColumn("q_code", col("l_quantity").cast("int"))
        .write.format("readstat").mode("overwrite").save(key50)

    // shuffled ordinal: key 41 gets ord 1 so the k=1 rung is the same
    // slice as the bench's stata_dpp_sel_* pair. Base scramble ord0 =
    // (q_code*7 mod 50)+1 is a bijection 1..50 → 1..50; transposing 41
    // into slot 1 displaces exactly two keys (41 had ord0=38, 50 had
    // ord0=1), so swap them: 41→1, 50→38, everyone else keeps ord0.
    // Result is an exact permutation of 1..50 and `ord <= k` selects
    // exactly k keys for every k — the earlier "+2 and special-case 41"
    // form vacated slot 39 and overflowed to 51, making the k=50 rung
    // select only 49 keys (~98% selectivity posing as the 100% anchor)
    val dimPath = s"${dta50.stripSuffix(".dta")}_sweepdim.parquet"
    spark.range(1, 51)
      .select(col("id").cast("int").as("q_code"))
      .withColumn("ord0", (pmod(col("q_code") * 7, lit(50)) + 1).cast("int"))
      .withColumn("ord",
        when(col("q_code") === 41, 1)
          .when(col("q_code") === 50, 38)
          .otherwise(col("ord0")).cast("int"))
      .drop("ord0")
      .coalesce(1).write.mode("overwrite").parquet(dimPath)

    def joined(k: Int): DataFrame = {
      val dim = spark.read.parquet(dimPath)
        .filter(col("ord") <= k).select(col("q_code").as("qk"))
      scan(key50)
        .select("q_code", "l_orderkey", "l_partkey", "l_extendedprice",
          "l_discount", "l_returnflag")
        .join(dim, col("q_code") === col("qk"))
        .agg(sum(col("l_extendedprice")), sum(col("l_discount")),
          count(col("l_orderkey")), count(col("l_partkey")),
          count(col("l_returnflag")), count(lit(1)))
    }

    def scanRows(df: DataFrame): Long = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      def allNodes(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case n => n }.flatMap {
          case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
          case q: QueryStageExec => q +: allNodes(q.plan)
          case n => Seq(n)
        }
      allNodes(df.queryExecution.executedPlan).collectFirst {
        case b: BatchScanExec
            if b.scan.isInstanceOf[graft.spark.readstat.ReadstatScan] =>
          b.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      }.getOrElse(-1L)
    }

    val dppKey = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    def runOnce(k: Int, dpp: Boolean): (Double, Long, Long) = {
      spark.conf.set(dppKey, dpp.toString)
      try {
        spark.catalog.clearCache()
        val df = joined(k)
        val t0 = System.nanoTime()
        val sel = df.collect()(0).getLong(5)
        ((System.nanoTime() - t0) / 1e9, sel, scanRows(df))
      } finally spark.conf.set(dppKey, "true")
    }

    val sink = new java.io.FileWriter(out, true)
    try {
      for (k <- Seq(1, 2, 5, 12, 25, 50)) {
        // warm both arms untimed, then ALTERNATE ON/OFF runs so an
        // ambient-load burst inflates paired runs of both arms rather
        // than one arm's whole sample (this environment's neighbor
        // sandboxes burst for tens of seconds at a time)
        runOnce(k, dpp = true); runOnce(k, dpp = false)
        val pairs = (1 to 4).map { _ =>
          (runOnce(k, dpp = true), runOnce(k, dpp = false))
        }
        val (onRuns, offRuns) = (pairs.map(_._1._1), pairs.map(_._2._1))
        val (_, selRows, rowsOn) = pairs.last._1
        val (_, _, rowsOff) = pairs.last._2
        def j(rs: Seq[Double]) =
          rs.map(r => f"$r%.4f").mkString("[", ",", "]")
        val line =
          f"""{"keys":$k,"sel_rows":$selRows,"on_min":${onRuns.min}%.4f,"on_runs":${j(onRuns)},"off_min":${offRuns.min}%.4f,"off_runs":${j(offRuns)},"scan_rows_on":$rowsOn,"scan_rows_off":$rowsOff}"""
        sink.write(line + "\n"); sink.flush()
        println(line)
      }
    } finally sink.close()
    spark.stop()
  }
}
