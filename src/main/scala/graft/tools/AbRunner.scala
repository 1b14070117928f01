package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One interleaved A/B round over the raw-read bench shapes (r13 judge
  * item 1: attribute the r12 raw-read min regressions to code or to
  * session noise with a committed artifact).
  *
  * This file is version-portable: it touches only the public DataFrame
  * API and the "readstat" format name, so the SAME source compiles in
  * the r11 worktree and in HEAD. The orchestration script packages both
  * versions, then alternates `java -cp <jars> graft.tools.AbRunner
  * <label> <outFile>` across versions for N rounds — each invocation is
  * a fresh JVM (codegen re-warmed untimed inside), both read the
  * byte-identical /tmp/graft_bench inputs, and rounds interleave so an
  * ambient-load burst lands in one ROUND, not in one version's whole
  * sample. CPU + IO sentinels are timed next to each query pass and
  * recorded, so residual contamination stays visible in the artifact.
  *
  * Appends one JSON line: {"label":…,"cpu":…,"io":…,"times":{…}}.
  */
object AbRunner {

  def main(args: Array[String]): Unit = {
    val label = args(0)
    val outFile = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scan(path: String): DataFrame =
      spark.read.format("readstat")
        .option("partitionTargetBytes", "16777216").load(path)

    val dta = s"/tmp/graft_bench/${tag}_big_v2.dta"
    val sav = s"/tmp/graft_bench/${tag}_big_v2.sav"
    val dta50 = s"/tmp/graft_bench/${tag}_big50_v2.dta"
    val savWide = s"/tmp/graft_bench/${tag}_wide.sav"
    val por = s"/tmp/graft_bench/${tag}_big_v1.por"
    val sasDir = "/tmp/graft_bench/sas_dir"

    // the four regressed queries, the one that improved (por — a
    // calibration control: if the A/B shows por ALSO "regressed" the
    // session is noisy), and the two filter shapes the r13 probe work
    // targets
    val queries: Seq[(String, () => Any)] = Seq(
      ("stata_fullread_10m", () => scan(dta).queryExecution.toRdd.count()),
      ("spss_fullread_10m", () => scan(sav).queryExecution.toRdd.count()),
      ("stata_fullread_50m", () => scan(dta50).queryExecution.toRdd.count()),
      ("sas_dir1000_subset", () => scan(sasDir).select("CONTROL")
        .agg(count(col("CONTROL"))).collect()(0).getLong(0)),
      ("spss_wide_subset", () => scan(savWide).select("c1", "c7")
        .agg(count(col("c1")), count(col("c7"))).collect()(0).getLong(0)),
      ("por_fullread_2m", () => spark.read.format("readstat")
        .option("partitionTargetBytes", "4194304").load(por)
        .queryExecution.toRdd.count()),
      ("stata_subset_read", () => scan(dta).select("l_quantity", "l_returnflag")
        .agg(count(col("l_quantity")), count(col("l_returnflag")))
        .collect()(0).getLong(0)),
      ("stata_subset_filter", () => scan(dta)
        .select("l_quantity", "l_extendedprice")
        .filter(col("l_quantity") > 25)
        .agg(count(lit(1))).collect()(0).getLong(0)),
      // r13-only key (the r11/r12 jars compiled the earlier list): the
      // ~2%-selective pushed-filter showcase — the probe must keep this
      // win while un-taxing the 50% shape above
      ("stata_filter_selective_50m", () => scan(dta50)
        .select("l_quantity", "l_extendedprice")
        .filter(col("l_quantity") > 49)
        .agg(sum(col("l_extendedprice")), count(lit(1)))
        .collect()(0).getLong(1)))

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

    // warm: codegen per query shape (fresh JVM every invocation), page
    // cache for the sentinel slice; both untimed
    queries.foreach { case (_, f) =>
      try f() catch { case t: Throwable =>
        System.err.println(s"warm failed: $t") } }
    cpuSentinel(); ioSentinel()

    val cpu = cpuSentinel()
    val io = ioSentinel()
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val times = queries.map { case (n, f) =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ok = try { f(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      n -> (if (ok) fmt(dt) else "null")
    }
    val line = s"""{"label":"$label","cpu":${fmt(cpu)},"io":${fmt(io)},""" +
      s""""times":{${times.map { case (n, v) => s""""$n":$v""" }.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(line)
    spark.stop()
  }
}
