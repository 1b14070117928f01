package graft.readstat

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** COUNT(*) aggregate pushdown: a bare count answers from file metadata
  * (header counts / record-length arithmetic / page indexes) without
  * decoding a row, for every format that can know its count cheaply.
  * Filtered, grouped, and column counts must NOT push down — they keep
  * the full scan and stay exact. POR (no metadata count) falls back. */
class CountPushdownSpec extends SparkTestBase {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_count").toFile
    d.deleteOnExit()
    import spark.implicits._
    val df = (1L to 257L).map(i => (i, i * 1.5, s"s$i", if (i % 3 == 0) null else s"t$i"))
      .toDF("id", "x", "s", "t")
    for (ext <- Seq("dta", "sav", "zsav", "xpt", "por"))
      df.write.format("readstat").mode("overwrite").save(s"$d/data.$ext")
    d.getAbsolutePath
  }

  private def countPlan(path: String): (Long, String) = {
    val df = spark.read.format("readstat").load(path).agg(count(lit(1)))
    (df.collect()(0).getLong(0), df.queryExecution.executedPlan.toString)
  }

  test("bare count(*) is metadata-only for dta/sav/zsav/xpt") {
    for (ext <- Seq("dta", "sav", "zsav", "xpt")) {
      val (n, plan) = countPlan(s"$dir/data.$ext")
      assert(n == 257L, s"$ext count")
      assert(plan.contains("count-star (metadata-only)"),
        s"$ext plan lacks pushed count: ${plan.take(800)}")
    }
  }

  test("sas7bdat count(*) pushes from page-index metadata") {
    // write path has no sas7bdat writer; use a reference fixture
    val p = res("fixtures/sas/test1.sas7bdat")
    val df = spark.read.format("readstat").load(p)
    val full = df.count()
    val agg = df.agg(count(lit(1)))
    assert(agg.collect()(0).getLong(0) == full)
    assert(agg.queryExecution.executedPlan.toString
      .contains("count-star (metadata-only)"))
  }

  test("POR has no metadata count and falls back to a real scan") {
    val (n, plan) = countPlan(s"$dir/data.por")
    assert(n == 257L)
    assert(!plan.contains("count-star (metadata-only)"))
  }

  test("filtered / grouped / column counts never push down") {
    val df = spark.read.format("readstat").load(s"$dir/data.dta")
    val filtered = df.filter(col("id") > 100).agg(count(lit(1)))
    assert(filtered.collect()(0).getLong(0) == 157L)
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("count-star (metadata-only)"))
    val grouped = df.groupBy((col("id") % 2).as("p")).agg(count(lit(1)).as("n"))
    assert(grouped.collect().map(_.getLong(1)).sorted.toSeq == Seq(128L, 129L))
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("count-star (metadata-only)"))
    // count(col) skips nulls -> must decode the column
    val colCount = df.agg(count(col("t")))
    assert(colCount.collect()(0).getLong(0) == 257L - 85L)
    assert(!colCount.queryExecution.executedPlan.toString
      .contains("count-star (metadata-only)"))
  }

  test("scan reports metadata statistics so small stat files auto-broadcast") {
    import spark.implicits._
    // a small .dta dimension joined to a larger parquet fact: without
    // reported statistics, DSv2 relations default to "huge" and the join
    // shuffles; with exact sizeInBytes/numRows Catalyst picks broadcast
    // on its own (no hint)
    val facts = (1L to 50000L).map(i => (i % 257 + 1, i)).toDF("id", "v")
    val dim = spark.read.format("readstat").load(s"$dir/data.dta")
      .select(col("id"), col("s"))
    val joined = facts.join(dim, "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected auto-broadcast of the stat-file side: ${plan.take(1200)}")
    assert(joined.count() == 50000L)
  }

  test("multi-file and merged loads sum metadata counts") {
    val two = spark.read.format("readstat")
      .load(s"$dir/data.dta", s"$dir/data.xpt").agg(count(lit(1)))
    assert(two.collect()(0).getLong(0) == 514L)
    assert(two.queryExecution.executedPlan.toString
      .contains("count-star (metadata-only)"))
  }
}
