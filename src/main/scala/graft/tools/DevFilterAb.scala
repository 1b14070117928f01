package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 settlement of the mid-selectivity pushed-filter numbers (r13
  * verdict item 2): committed records disagree on whether the 50M
  * date-band filter beats the unfiltered read (0.149 vs 0.167 in one
  * record, 0.163 vs 0.138 in the next), and `stata_subset_filter_50m`
  * sits ~13% above its r11 level without attribution.
  *
  * Design: one idle JVM, shapes interleaved per round (a load burst
  * lands in one ROUND, not one shape's whole sample), CPU + IO
  * sentinels timed every round and recorded. Each pushed-filter shape
  * has a NOPUSH twin — the same predicate made untranslatable by `+0`
  * arithmetic (`date_add(c,0)`, `c+0`), so Catalyst keeps an identical
  * residual Filter but the scan claims nothing: the pushed-vs-nopush
  * delta IS the net effect of the pushdown machinery (probe + skip),
  * cleanly separated from the filter's intrinsic residual cost, within
  * one session. Measured pass counts are recorded so selectivity
  * claims in the docs are facts, not folklore.
  *
  * Appends JSON lines to the output file (arg 1, default
  * PROFILE_FILTER_AB_R14.json): first a {"rows":…} header with file
  * row counts + per-filter pass counts, then one line per round:
  * {"round":i,"cpu":s,"io":s,"times":{shape:sec,…}}.
  *
  *   sbt "runMain graft.tools.DevFilterAb"
  */
object DevFilterAb {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("PROFILE_FILTER_AB_R14.json")
    val rounds = args.lift(1).map(_.toInt).getOrElse(12)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bigFiles = graft.Bench.ensureBigFiles(spark, sfDir)
    val (dta50, dtaDate) = bigFiles match {
      case Some((_, _, d50, _, _, _, _, dd)) => (d50, dd)
      case None => sys.error("bench file setup failed")
    }
    def scan(p: String): DataFrame = spark.read.format("readstat")
      .option("partitionTargetBytes", "16777216").load(p)

    val dateLo = lit("1994-01-01").cast("date")
    val dateHi = lit("1994-02-20").cast("date")

    val shapes: Seq[(String, () => Long)] = Seq(
      ("date_subset", () =>
        scan(dtaDate).select("ship_date", "l_extendedprice")
          .agg(count(col("ship_date")), count(col("l_extendedprice")))
          .collect()(0).getLong(0)),
      ("date_filter_push", () =>
        scan(dtaDate).select("ship_date", "l_extendedprice")
          .filter(col("ship_date") >= dateLo && col("ship_date") < dateHi)
          .agg(sum(col("l_extendedprice")), count(lit(1)))
          .collect()(0).getLong(1)),
      ("date_filter_nopush", () =>
        scan(dtaDate).select("ship_date", "l_extendedprice")
          .filter(date_add(col("ship_date"), 0) >= dateLo &&
            date_add(col("ship_date"), 0) < dateHi)
          .agg(sum(col("l_extendedprice")), count(lit(1)))
          .collect()(0).getLong(1)),
      ("subset_read_50m", () =>
        scan(dta50).select("l_quantity", "l_returnflag")
          .agg(count(col("l_quantity")), count(col("l_returnflag")))
          .collect()(0).getLong(0)),
      ("subset_filter_push", () =>
        scan(dta50).select("l_quantity", "l_extendedprice")
          .filter(col("l_quantity") > 25)
          .agg(count(lit(1))).collect()(0).getLong(0)),
      ("subset_filter_nopush", () =>
        scan(dta50).select("l_quantity", "l_extendedprice")
          .filter(col("l_quantity") + 0 > 25)
          .agg(count(lit(1))).collect()(0).getLong(0)),
      ("selective_filter_push", () =>
        scan(dta50).select("l_quantity", "l_extendedprice")
          .filter(col("l_quantity") > 49)
          .agg(sum(col("l_extendedprice")), count(lit(1)))
          .collect()(0).getLong(1)),
      ("selective_filter_nopush", () =>
        scan(dta50).select("l_quantity", "l_extendedprice")
          .filter(col("l_quantity") + 0 > 49)
          .agg(sum(col("l_extendedprice")), count(lit(1)))
          .collect()(0).getLong(1)))

    // sanity: the nopush twins must really claim nothing
    def pushedOf(df: DataFrame): String = {
      val leaf = df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString
      val i = leaf.indexOf("PushedFilters")
      if (i < 0) "none" else leaf.substring(i, math.min(leaf.length, i + 120))
    }
    val pushProbe = scan(dtaDate).select("ship_date")
      .filter(col("ship_date") >= dateLo)
    val nopushProbe = scan(dtaDate).select("ship_date")
      .filter(date_add(col("ship_date"), 0) >= dateLo)
    println(s"push leaf:   ${pushedOf(pushProbe)}")
    println(s"nopush leaf: ${pushedOf(nopushProbe)}")

    def cpuSentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).agg(sum(col("id"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val ioBuf = java.nio.ByteBuffer.allocateDirect(8 << 20)
    def ioSentinel(): Double = {
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(dta50))
      val t0 = System.nanoTime()
      try {
        var remaining = math.min(ch.size(), 256L << 20)
        var sink = 0L
        while (remaining > 0) {
          ioBuf.clear()
          if (remaining < ioBuf.capacity()) ioBuf.limit(remaining.toInt)
          val n = ch.read(ioBuf)
          if (n <= 0) remaining = 0
          else { sink += ioBuf.get(0).toLong + n; remaining -= n }
        }
        if (sink == Long.MinValue) println(sink)
      } finally ch.close()
      (System.nanoTime() - t0) / 1e9
    }

    // warm every shape untimed (codegen + page cache) and capture row
    // facts for the header line
    val rowFacts = shapes.map { case (n, f) => n -> f() }
    val sink = new java.io.FileWriter(out, true)
    try {
      sink.write(rowFacts.map { case (n, v) => s""""$n":$v""" }
        .mkString("{\"rows\":{", ",", "}}\n"))
      sink.flush()
      cpuSentinel(); ioSentinel() // warm sentinels
      for (r <- 1 to rounds) {
        val cpu = cpuSentinel()
        val io = ioSentinel()
        val times = shapes.map { case (n, f) =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          f()
          n -> (System.nanoTime() - t0) / 1e9
        }
        val line = times.map { case (n, t) => f""""$n":$t%.4f""" }
          .mkString(f"""{"round":$r,"cpu":$cpu%.3f,"io":$io%.3f,"times":{""",
            ",", "}}")
        sink.write(line + "\n"); sink.flush()
        println(line)
      }
    } finally sink.close()
    spark.stop()
  }
}
