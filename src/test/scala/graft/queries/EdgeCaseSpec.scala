package graft.queries

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** ANSI-mode edge cases the gate corpus never exercises: Spark 4 defaults
  * `spark.sql.ansi.enabled` ON, so an unguarded x/0 anywhere in a query
  * throws DIVIDE_BY_ZERO instead of yielding null — empty-text documents
  * and constant-valued event groups are exactly the inputs that hit those
  * divides (round-9 advisor finding). Each test replays a registry query
  * over a corpus WITH the degenerate rows and pins the documented
  * null/zero passthrough.
  */
class EdgeCaseSpec extends SparkTestBase {

  import spark.implicits._

  /** sf0.001 testdata plus an empty-text doc, a whitespace-only doc, and
    * a constant-valued event group, rewritten to a temp sf dir. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_edge").toFile
    d.deleteOnExit()
    val src = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val extra = Seq(
      (9000001L, "", "en", "edge", 0L),
      (9000002L, " \t ", "en", "edge", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(extra).coalesce(1)
      .write.parquet(s"$d/documents.parquet")
    val ev = spark.read.parquet(s"$src/events.parquet")
    // a brand-new event_type whose every value is identical → mx == mn
    val const = spark.range(40).select(
      (col("id") + 9000000L).as("event_id"),
      to_timestamp(lit("2024-01-01 00:00:00")).cast("timestamp_ntz").as("ts"),
      (col("id") % 4).as("user_id"),
      lit("edge_const").as("event_type"),
      lit(42.5).as("value"),
      lit("{}").as("props"))
    ev.unionByName(const).coalesce(1).write.parquet(s"$d/events.parquet")
    d.getAbsolutePath
  }

  test("quality_percentile passes empty-text docs through with null q/pct") {
    val out = Curation.qualityPercentile(spark, dir)
      .filter(col("doc_id") >= 9000001L).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(1) && out(0).isNullAt(2),
      "empty text must yield null q and null pct, not DIVIDE_BY_ZERO")
    // whitespace-only text has length 3 > 0: q = 0/3 = 0.0, pct defined
    assert(out(1).getDouble(1) == 0.0 && !out(1).isNullAt(2))
  }

  test("text_quality_score yields null ratios on empty text") {
    val r = Text.qualityScore(spark, dir)
      .filter(col("doc_id") === 9000001L).collect()(0)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("sample_quality_bins scores empty text 0.0 and still bins it") {
    val r = Text.qualityBins(spark, dir)
      .filter(col("doc_id") === 9000001L).collect()(0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getLong(2) == 0L, "score 0.0 sorts first -> bottom bin")
  }

  test("dedup_keep_best keeps empty-text docs as null-q singletons") {
    val r = Text.keepBest(spark, dir)
      .filter(col("doc_id") === 9000001L).collect()(0)
    assert(r.getLong(1) == 9000001L && r.getLong(2) == 1L)
    assert(r.isNullAt(3), "q must be null for empty text")
    assert(r.getInt(4) == 1, "singletons are kept")
  }

  test("BigDecimal.valueOf matches Spark round/cast on shortest-repr ties") {
    // 2.675's binary expansion is 2.67499999…, so new BigDecimal(2.675)
    // rounds to 2.67 while Spark's Round (shortest decimal repr) gives
    // 2.68 — the streaming anomaly operator must use valueOf to stay
    // bit-exact with the batch query (round-9 advisor finding)
    for (v <- Seq(2.675, 133.375, 0.005, -1.115, 7.0000005)) {
      val sparkRound = spark.range(1)
        .select(round(lit(v), 2)).collect()(0).getDouble(0)
      val ours = java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue
      assert(ours == sparkRound, s"round($v, 2): $ours vs Spark $sparkRound")
      val sparkDec = spark.range(1)
        .select(lit(v).cast("decimal(18,6)").cast("double"))
        .collect()(0).getDouble(0)
      val oursDec = java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      assert(oursDec == sparkDec, s"decimal(18,6) of $v: $oursDec vs $sparkDec")
    }
  }

  test("events_hist_quantiles pins a constant-valued group to its value") {
    val out = Analytics.histQuantiles(spark, dir)
      .filter(col("event_type") === "edge_const").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getDouble(1) == 42.5 && r.getDouble(2) == 42.5 &&
      r.getDouble(3) == 42.5,
      s"mx == mn group must report p50=p90=p99=value, got $r")
  }
}
